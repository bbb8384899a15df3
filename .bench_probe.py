import time, numpy as np, jax, jax.numpy as jnp
from simpledsp_tpu.kernels.fft import rfft_frames
rng = np.random.default_rng(0)
c, t = 64, 1<<20
x = jnp.asarray(rng.standard_normal((c, t)), dtype=jnp.float32)
xf = x.reshape(c, -1, 4096)

def bench(name, fn, *args, iters=12):
    out = fn(*args)
    leaf = jax.tree_util.tree_leaves(out)[0]
    float(jnp.sum(leaf[0, :8]))        # compile + sync
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    # device executes in order: syncing the LAST result bounds the whole loop
    leaf = jax.tree_util.tree_leaves(out)[0]
    float(jnp.sum(leaf[0, :8]))
    t_loop = time.perf_counter() - t0
    t0 = time.perf_counter(); float(jnp.sum(leaf[0, :8])); t_fetch = time.perf_counter() - t0
    dt = (t_loop - t_fetch)/iters
    print(f"{name:28s} {dt*1e3:7.2f} ms {c*t/dt/1e6:8.0f} Msamp/s", flush=True)

bench("memcpy a+1", jax.jit(lambda a: a + 1.0), x)
H3 = jax.lax.Precision.HIGH
for fpt in (8, 16):
    bench(f"rfft split r={fpt}", jax.jit(lambda a, f=fpt: rfft_frames(a, frames_per_tile=f, precision=H3)), xf)
bench("rfft HIGHEST r=16", jax.jit(lambda a: rfft_frames(a, frames_per_tile=16)), xf)
