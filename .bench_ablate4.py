import time, numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
rng = np.random.default_rng(0)
total = 1 << 26

def run(name, shape, blk_shape, iters=12):
    arr = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    nd = len(shape)
    if nd == 2:
        im = lambda i: (i, 0)
    else:
        im = lambda i: (i, 0, 0)
    blk = pl.BlockSpec(blk_shape, im, memory_space=pltpu.VMEM)
    body = lambda x_ref, o_ref: o_ref.__setitem__(slice(None), x_ref[:])
    fn = jax.jit(lambda a: pl.pallas_call(body, grid=(shape[0]//blk_shape[0],),
        in_specs=[blk], out_specs=blk,
        out_shape=jax.ShapeDtypeStruct(shape, jnp.float32))(a))
    out = fn(arr); float(jnp.sum(out[0].ravel()[:2]))
    t0=time.perf_counter()
    for _ in range(iters): out = fn(arr)
    float(jnp.sum(out[0].ravel()[:2])); t_loop=time.perf_counter()-t0
    t0=time.perf_counter(); float(jnp.sum(out[0].ravel()[:2])); t_f=time.perf_counter()-t0
    dt=(t_loop-t_f)/iters
    print(f"{name:36s} {dt*1e3:7.2f} ms  {2*total*4/dt/1e9:6.0f} GB/s", flush=True)

run("2d lane=128 blk(2048,128)", (total//128, 128), (2048, 128))
run("2d lane=64  blk(4096,64)", (total//64, 64), (4096, 64))
run("3d (16,64,128)", (total//8192, 64, 128), (16, 64, 128))
run("3d (16,16,512)", (total//8192, 16, 512), (16, 16, 512))
run("3d (4,64,512)", (total//(64*512), 64, 512), (4, 64, 512))
