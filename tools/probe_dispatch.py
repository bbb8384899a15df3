"""Characterize the per-executable dispatch overhead of pallas-containing
jits on the axon runtime: tiny XLA jit vs tiny pallas jit vs grid size."""

import time

import numpy as np


def timeit(fj, x, iters=16):
    o = fj(x); float(np.asarray(o.ravel()[0]))
    start = time.perf_counter()
    for _ in range(iters):
        o = fj(x)
    float(np.asarray(o.ravel()[0]))
    return (time.perf_counter() - start) / iters


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((8, 128)).astype(np.float32))

    dt = timeit(jax.jit(lambda a: a * 2.0 + 1.0), x)
    print(f"xla tiny:            {dt*1e3:7.3f} ms", flush=True)

    def body(x_ref, o_ref):
        o_ref[:] = x_ref[:] * 2.0

    for grid in (1, 16, 256, 1024):
        def fn(a, grid=grid):
            return pl.pallas_call(
                body, grid=(grid,),
                in_specs=[pl.BlockSpec((8, 128), lambda i: (0, 0),
                                       memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec((8, 128), lambda i: (0, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
            )(a)
        dt = timeit(jax.jit(fn), x)
        print(f"pallas tiny grid={grid:5d}: {dt*1e3:7.3f} ms", flush=True)

    # XLA executable of comparable op count to the chain pipeline but no
    # pallas: is overhead custom-call-specific or executable-size-bound?
    big = jnp.asarray(rng.standard_normal((4096, 4096)).astype(np.float32))
    dt = timeit(jax.jit(lambda a: (a @ a).sum(axis=1, keepdims=True)), big)
    print(f"xla 4k matmul:       {dt*1e3:7.3f} ms", flush=True)


if __name__ == "__main__":
    main()
