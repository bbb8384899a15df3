"""Is the ~4 ms pallas floor a RATE (scales with bytes) or a fixed
per-call overhead?  Same copy kernel at 1/4x, 1/2x, 1x, 2x data."""

import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n1, n2, r = 32, 128, 32
    rng = np.random.default_rng(0)

    def body(x_ref, o_ref):
        o_ref[:] = x_ref[:] * 2.0

    for f_total in (4096, 8192, 16384, 32768):
        x3 = jnp.asarray(
            rng.standard_normal((f_total, n1, n2)).astype(np.float32))

        def fn(xx, f_total=f_total):
            return pl.pallas_call(
                body, grid=(f_total // r,),
                in_specs=[pl.BlockSpec((r, n1, n2), lambda i: (i, 0, 0),
                                       memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec((r, n1, n2), lambda i: (i, 0, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((f_total, n1, n2),
                                               jnp.float32),
            )(xx)

        fj = jax.jit(fn)
        o = fj(x3); float(jnp.sum(o.ravel()[0]))
        start = time.perf_counter()
        for _ in range(8):
            o = fj(x3)
        float(jnp.sum(o.ravel()[0]))
        dt = (time.perf_counter() - start) / 8
        mb = x3.size * 4 / 1e6
        print(f"f={f_total:6d} ({mb:5.0f} MB): {dt*1e3:7.3f} ms  "
              f"({2 * mb / 1e3 / dt:.0f} GB/s rw)", flush=True)

    # Two chained pallas copies in ONE jit: fixed per-call overhead would
    # add ~4 ms again; true rate would double the time of one.
    f_total = 16384
    x3 = jnp.asarray(
        rng.standard_normal((f_total, n1, n2)).astype(np.float32))

    def fn2(xx):
        def one(a):
            return pl.pallas_call(
                body, grid=(f_total // r,),
                in_specs=[pl.BlockSpec((r, n1, n2), lambda i: (i, 0, 0),
                                       memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec((r, n1, n2), lambda i: (i, 0, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((f_total, n1, n2),
                                               jnp.float32),
            )(a)
        return one(one(xx))

    fj = jax.jit(fn2)
    o = fj(x3); float(jnp.sum(o.ravel()[0]))
    start = time.perf_counter()
    for _ in range(8):
        o = fj(x3)
    float(jnp.sum(o.ravel()[0]))
    dt = (time.perf_counter() - start) / 8
    print(f"two chained copies: {dt*1e3:.3f} ms", flush=True)


if __name__ == "__main__":
    main()
