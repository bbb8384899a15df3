"""Measure Pallas DMA bandwidth vs minor-dim width on v5e.

The chain kernel writes two (f, 64, 32) planes (32-lane minor) — 268
MB/call.  If narrow-lane stores run at the ~133 GB/s relayout rate instead
of ~750, the store alone is ~2 ms of the 4.5 ms kernel.  This probe times
identical-byte VMEM round-trips with different tilings:

  wide:    (f, 16, 128) copy        (128-lane rows both ways)
  narrow:  (f, 64, 32) copy         (32-lane rows both ways)
  regmix:  (f, 16, 128) in -> in-register transpose -> (f, 128, 16) out
           (wide load, 16-lane store — the reg kernel's store pattern)

Run from the repo root:  python -m tools.probe_store
"""

import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    f, r = 16384, 64
    rng = np.random.default_rng(0)

    def run(name, body, in_shape, in_blk, out_shape, out_blk):
        x = jnp.asarray(rng.standard_normal(in_shape).astype(np.float32))
        fn = pl.pallas_call(
            body, grid=(f // r,),
            in_specs=[pl.BlockSpec(in_blk, lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(out_blk, lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct(out_shape, jnp.float32))
        jfn = jax.jit(fn)
        try:
            y = jfn(x)
            float(jnp.sum(y.ravel()[:1]))
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__}: {str(e)[:160]}",
                  flush=True)
            return
        n_it = 8
        times = []
        for _ in range(3):
            start = time.perf_counter()
            ys = [jfn(x) for _ in range(n_it)]
            float(sum(jnp.sum(yy.ravel()[:1]) for yy in ys))
            times.append((time.perf_counter() - start) / n_it)
            del ys
        dt = sorted(times)[1]
        gbs = 2 * x.size * 4 / dt / 1e9
        print(f"{name}: {dt*1e3:.3f} ms  {gbs:.0f} GB/s (r+w)", flush=True)

    def body_copy(x_ref, o_ref):
        o_ref[:] = x_ref[:] * 2.0

    run("wide   (f,16,128)->(f,16,128)", body_copy,
        (f, 16, 128), (r, 16, 128), (f, 16, 128), (r, 16, 128))

    run("narrow (f,64,32)->(f,64,32)  ", body_copy,
        (f, 64, 32), (r, 64, 32), (f, 64, 32), (r, 64, 32))

    def body_regmix(x_ref, o_ref):
        o_ref[:] = jnp.transpose(x_ref[:] * 2.0, (0, 2, 1))

    run("regmix (f,16,128)->(f,128,16)", body_regmix,
        (f, 16, 128), (r, 16, 128), (f, 128, 16), (r, 128, 16))


if __name__ == "__main__":
    main()
