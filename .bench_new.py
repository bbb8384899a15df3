import time, numpy as np, jax, jax.numpy as jnp
from simpledsp_tpu.kernels.fft import rfft_frames
from simpledsp_tpu.models.northstar import NorthStarChain
rng = np.random.default_rng(0)
c, t = 64, 1<<20
x = jnp.asarray(rng.standard_normal((c, t)), dtype=jnp.float32)
xf = x.reshape(c, -1, 4096)

def bench(name, fn, *args, iters=12):
    out = fn(*args)
    leaf = jax.tree_util.tree_leaves(out)[0]
    float(jnp.sum(leaf.ravel()[:8]))
    t0 = time.perf_counter()
    for _ in range(iters): out = fn(*args)
    leaf = jax.tree_util.tree_leaves(out)[0]
    float(jnp.sum(leaf.ravel()[:8]))
    t_loop = time.perf_counter()-t0
    t0 = time.perf_counter(); float(jnp.sum(leaf.ravel()[:8])); t_f = time.perf_counter()-t0
    dt = (t_loop-t_f)/iters
    print(f"{name:30s} {dt*1e3:7.2f} ms {c*t/dt/1e6:8.0f} Msamp/s", flush=True)

H3 = jax.lax.Precision.HIGH
bench("rfft32x128 split r=16", jax.jit(lambda a: rfft_frames(a, frames_per_tile=16, precision=H3)), xf)
bench("rfft32x128 HIGHEST r=16", jax.jit(lambda a: rfft_frames(a, frames_per_tile=16)), xf)

def chain_bench(name, chain, iters=16):
    s0 = jnp.zeros((c, 10), dtype=jnp.float32)
    fwd = jax.jit(chain._forward)
    (sr, si), s = fwd(x, s0); float(jnp.sum(s))
    # accuracy
    import scipy.signal as sig
    from simpledsp_tpu.design.biquad import sos_matrix
    xh = np.asarray(x[0,:4096], np.float64)
    ref = np.fft.fft(sig.sosfilt(sos_matrix(chain.design), xh))
    got = np.asarray(sr[0,0], np.float64) + 1j*np.asarray(si[0,0], np.float64)
    snr = 10*np.log10(np.mean(np.abs(ref)**2)/np.mean(np.abs(got-ref)**2))
    s = s0; t0 = time.perf_counter()
    for _ in range(iters): (sr, si), s = fwd(x, s)
    float(jnp.sum(s)); t_loop = time.perf_counter()-t0
    t0 = time.perf_counter(); float(jnp.sum(s)); t_f = time.perf_counter()-t0
    dt = (t_loop-t_f)/iters
    print(f"{name:30s} {dt*1e3:7.2f} ms {c*t/dt/1e6:8.0f} Msamp/s  SNR {snr:6.1f} dB", flush=True)

chain_bench("chain fused HIGH", NorthStarChain(use_pallas=True, precision=H3))
chain_bench("chain fused HIGHEST", NorthStarChain(use_pallas=True))
