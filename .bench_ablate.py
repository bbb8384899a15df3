import time, functools, numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from simpledsp_tpu.ops.fft import _dft_mats_f64, _twiddle_f64

rng = np.random.default_rng(0)
f_total, n1, n2 = 16384, 64, 64
N = n1*n2
x3 = jnp.asarray(rng.standard_normal((f_total, n1, n2)), jnp.float32)
w1c, w1s = [a.astype(np.float32) for a in _dft_mats_f64(n1)]
tc, ts = [a.T.copy().astype(np.float32) for a in _twiddle_f64(n1, n2)]

def run(name, body, r, n_tables=6, iters=12):
    in_blk = pl.BlockSpec((r, n1, n2), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    cs = lambda a: pl.BlockSpec(a.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
    tables = (w1c, w1s, w1c, w1s, tc, ts)[:n_tables]
    out_blk = pl.BlockSpec((r, n2, n1), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    fn = jax.jit(lambda a: pl.pallas_call(
        body, grid=(f_total//r,),
        in_specs=[in_blk] + [cs(t) for t in tables],
        out_specs=(out_blk, out_blk),
        out_shape=(jax.ShapeDtypeStruct((f_total, n2, n1), jnp.float32),)*2,
    )(a, *[jnp.asarray(t) for t in tables]))
    out = fn(x3); float(jnp.sum(out[0][0,:2,:2]))
    t0=time.perf_counter()
    for _ in range(iters): out = fn(x3)
    float(jnp.sum(out[0][0,:2,:2]))
    t_loop = time.perf_counter()-t0
    t0=time.perf_counter(); float(jnp.sum(out[0][0,:2,:2])); t_f=time.perf_counter()-t0
    dt=(t_loop-t_f)/iters
    print(f"{name:34s} r={r:3d} {dt*1e3:7.2f} ms {f_total*N/dt/1e6:8.0f} Msamp/s", flush=True)

def dots(split):
    def dot(a, b):
        raw = functools.partial(jax.lax.dot_general,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT if split else jax.lax.Precision.HIGHEST)
        if not split: return raw(a, b)
        ah = a.astype(jnp.bfloat16); al=(a-ah.astype(jnp.float32)).astype(jnp.bfloat16)
        bh = b.astype(jnp.bfloat16); bl=(b-bh.astype(jnp.float32)).astype(jnp.bfloat16)
        return raw(ah,bh)+raw(al,bh)+raw(ah,bl)
    return dot

def body_copy(x_ref, *refs):
    yr_ref, yi_ref = refs[-2], refs[-1]
    yr_ref[:] = jnp.swapaxes(x_ref[:], 1, 2)
    yi_ref[:] = jnp.swapaxes(x_ref[:], 1, 2)

def body_full(x_ref, a_ref, b_ref, c_ref, d_ref, tc_ref, ts_ref, yr_ref, yi_ref):
    dot = dots(True)
    cr = dot(x_ref[:], a_ref[:]); sr = dot(x_ref[:], b_ref[:])
    tr = cr*tc_ref[:] - sr*ts_ref[:]; ti = sr*tc_ref[:] + cr*ts_ref[:]
    yr2 = dot(tr, c_ref[:]) - dot(ti, d_ref[:])
    yi2 = dot(ti, c_ref[:]) + dot(tr, d_ref[:])
    yr_ref[:] = jnp.swapaxes(yr2, 1, 2); yi_ref[:] = jnp.swapaxes(yi2, 1, 2)

def body_noswap(x_ref, a_ref, b_ref, c_ref, d_ref, tc_ref, ts_ref, yr_ref, yi_ref):
    dot = dots(True)
    cr = dot(x_ref[:], a_ref[:]); sr = dot(x_ref[:], b_ref[:])
    tr = cr*tc_ref[:] - sr*ts_ref[:]; ti = sr*tc_ref[:] + cr*ts_ref[:]
    yr_ref[:] = dot(tr, c_ref[:]) - dot(ti, d_ref[:])
    yi_ref[:] = dot(ti, c_ref[:]) + dot(tr, d_ref[:])

def body_dots2(x_ref, a_ref, b_ref, c_ref, d_ref, tc_ref, ts_ref, yr_ref, yi_ref):
    dot = dots(True)
    yr_ref[:] = dot(x_ref[:], a_ref[:])
    yi_ref[:] = dot(x_ref[:], b_ref[:])

run("copy+swap only", body_copy, 16, 0)
run("2 split-dots only", body_dots2, 16)
run("full no-swap", body_noswap, 16)
run("full (6 dots+tw+swap)", body_full, 16)
run("full r=32", body_full, 32)
run("full r=64", body_full, 64)
