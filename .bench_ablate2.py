import time, numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

rng = np.random.default_rng(0)
f_total, n1, n2 = 16384, 64, 64
N = n1*n2
x3 = jnp.asarray(rng.standard_normal((f_total, n1, n2)), jnp.float32)

def run(name, body, r, n_out=1, out_swap=False, iters=12, **kw):
    in_blk = pl.BlockSpec((r, n1, n2), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    ob = pl.BlockSpec((r, n2, n1) if out_swap else (r, n1, n2),
                      lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    oshape = jax.ShapeDtypeStruct((f_total, n2, n1) if out_swap else (f_total, n1, n2), jnp.float32)
    fn = jax.jit(lambda a: pl.pallas_call(
        body, grid=(f_total//r,), in_specs=[in_blk],
        out_specs=(ob,)*n_out if n_out > 1 else ob,
        out_shape=(oshape,)*n_out if n_out > 1 else oshape, **kw)(a))
    out = fn(x3)
    leaf = out[0] if isinstance(out, (tuple, list)) else out
    float(jnp.sum(leaf[0,:2,:2]))
    t0=time.perf_counter()
    for _ in range(iters): out = fn(x3)
    leaf = out[0] if isinstance(out, (tuple, list)) else out
    float(jnp.sum(leaf[0,:2,:2]))
    t_loop=time.perf_counter()-t0
    t0=time.perf_counter(); float(jnp.sum(leaf[0,:2,:2])); t_f=time.perf_counter()-t0
    dt=(t_loop-t_f)/iters
    gbps = (1+n_out)*f_total*N*4/dt/1e9
    print(f"{name:30s} r={r:3d} {dt*1e3:7.2f} ms  {gbps:6.0f} GB/s", flush=True)

def b_copy1(x_ref, o_ref): o_ref[:] = x_ref[:]
def b_copy2(x_ref, o1, o2): o1[:] = x_ref[:]; o2[:] = x_ref[:]
def b_swap1(x_ref, o_ref): o_ref[:] = jnp.swapaxes(x_ref[:], 1, 2)
def b_swap2(x_ref, o1, o2):
    s = jnp.swapaxes(x_ref[:], 1, 2); o1[:] = s; o2[:] = s

run("pure copy 1out", b_copy1, 16)
run("pure copy 2out", b_copy2, 16, n_out=2)
run("swap 1out", b_swap1, 16, out_swap=True)
run("swap 2out", b_swap2, 16, n_out=2, out_swap=True)
run("pure copy 1out r=32", b_copy1, 32)
run("pure copy 1out r=128", b_copy1, 128)
