import time, numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

rng = np.random.default_rng(0)
total = 1 << 26   # 64 Mi f32 = 268 MB
x2 = jnp.asarray(rng.standard_normal((total // 512, 512)), jnp.float32)

def run(name, rows, cols, arr, iters=12, grid_dims=1):
    R, C = arr.shape
    body = lambda x_ref, o_ref: o_ref.__setitem__(slice(None), x_ref[:])
    blk = pl.BlockSpec((rows, cols), (lambda i: (i, 0)) if grid_dims==1 else (lambda i,j:(i,j)),
                       memory_space=pltpu.VMEM)
    grid = (R//rows,) if grid_dims==1 else (R//rows, C//cols)
    fn = jax.jit(lambda a: pl.pallas_call(body, grid=grid, in_specs=[blk],
        out_specs=blk, out_shape=jax.ShapeDtypeStruct((R, C), jnp.float32))(a))
    out = fn(arr); float(jnp.sum(out[0,:2]))
    t0=time.perf_counter()
    for _ in range(iters): out = fn(arr)
    float(jnp.sum(out[0,:2])); t_loop=time.perf_counter()-t0
    t0=time.perf_counter(); float(jnp.sum(out[0,:2])); t_f=time.perf_counter()-t0
    dt=(t_loop-t_f)/iters
    print(f"{name:34s} {dt*1e3:7.2f} ms  {2*R*C*4/dt/1e9:6.0f} GB/s", flush=True)

run("2d (1024,512) blocks", 1024, 512, x2)
run("2d (8192,512) blocks", 8192, 512, x2)
run("2d (512,512) blocks", 512, 512, x2)
x_wide = x2.reshape(8192, 8192)
run("2d (256,8192) wide blocks", 256, 8192, x_wide)
run("2d (8192, 256) tall blocks", 8192, 256, x_wide, grid_dims=2)
