"""Probe: ways to get (B, T) flat streams into the PFB's channel-major
(B, M, nfr) layout — the bank's measured bottleneck (10.7 ms of 18.8).

1. xla_swap:   reshape + swapaxes (current frames_t)
2. xla_4d:     reshape(B, nfr/8, 8, M) -> transpose(0,3,1,2) -> reshape
3. kernel_t:   pallas kernel, contiguous (L, M) tile DMA + in-register
               transpose (XLU), pack streams on sublanes
Run:  python -m tools.probe_transpose
"""

import json
import time

import numpy as np


def timeit(fn, *args, iters=8):
    import jax.numpy as jnp
    out = fn(*args)
    out = out[0] if isinstance(out, tuple) else out
    float(jnp.sum(out.ravel()[:1]))
    start = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    out = out[0] if isinstance(out, tuple) else out
    float(jnp.sum(out.ravel()[:1]))
    t_loop = time.perf_counter() - start
    start = time.perf_counter()
    float(jnp.sum(out.ravel()[:1]))
    t_fetch = time.perf_counter() - start
    return max(t_loop - t_fetch, 1e-9) / iters


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, m = 16, 16
    nfr = (1 << 16) + 128          # output frames + halo pad
    t = nfr * m
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((b, t)).astype(np.float32))
    results = {}
    gb = 2 * b * t * 4 / 1e9       # read + write

    def rec(name, fn, *args):
        try:
            dt = timeit(fn, *args)
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__}: {str(e)[:300]}",
                  flush=True)
            return None
        results[name] = round(dt * 1e3, 3)
        print(f"{name}: {dt*1e3:.3f} ms ({gb/dt:.0f} GB/s rw)", flush=True)
        return dt

    def xla_swap(a):
        return jnp.swapaxes(a.reshape(b, nfr, m), -1, -2)

    def xla_4d(a):
        return a.reshape(b, nfr // 8, 8, m).transpose(0, 3, 1, 2) \
                .reshape(b, m, nfr)

    r_swap = jax.jit(xla_swap)(x)
    r_4d = jax.jit(xla_4d)(x)
    print("4d == swap:",
          bool(jnp.all(r_swap == r_4d)), flush=True)
    rec("xla_swap", jax.jit(xla_swap), x)
    rec("xla_4d", jax.jit(xla_4d), x)

    # In-kernel: contiguous (L, M) tile DMA + XLU transpose, P streams
    # packed on sublanes.
    for pack, lt in ((8, 2048), (8, 8192), (1, 8192)):
        pm = pack * m
        bp = b // pack
        ntiles = nfr // lt
        total = bp * ntiles
        x3 = x.reshape(b, nfr, m)

        def body(x_ref, o_ref, scr, sem, pack=pack, lt=lt, ntiles=ntiles,
                 total=total, pm=pm):
            s = pl.program_id(0)
            i32 = lambda v: jnp.asarray(v, s.dtype)  # noqa: E731

            def dma(step, slot):
                bb = step // i32(ntiles)
                ii = step - bb * i32(ntiles)
                return pltpu.make_async_copy(
                    x_ref.at[bb * i32(pack), pl.ds(ii * i32(lt), lt), :]
                    if pack == 1 else
                    x_ref.at[pl.ds(bb * i32(pack), pack),
                             pl.ds(ii * i32(lt), lt), :],
                    scr.at[slot], sem.at[slot])

            @pl.when(s == 0)
            def _():
                dma(i32(0), 0).start()

            @pl.when(s + 1 < total)
            def _():
                dma(s + i32(1), jax.lax.rem(s + i32(1), i32(2))).start()

            slot = jax.lax.rem(s, i32(2))
            dma(s, slot).wait()
            if pack == 1:
                o_ref[0] = jnp.transpose(scr[slot], (1, 0))
            else:
                v = scr[slot]                     # (pack, lt, m)
                parts = [jnp.transpose(v[q], (1, 0)) for q in range(pack)]
                o_ref[0] = jax.lax.concatenate(parts, 0)

        scr_shape = (2, lt, m) if pack == 1 else (2, pack, lt, m)
        fn = jax.jit(lambda a, body=body, pack=pack, lt=lt, total=total,
                     ntiles=ntiles, pm=pm, scr_shape=scr_shape: pl.pallas_call(
            body, grid=(total,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec(
                (1, pm, lt), lambda s: (s // ntiles, 0, s % ntiles)),
            out_shape=jax.ShapeDtypeStruct((b // pack, pm, nfr),
                                           jnp.float32),
            scratch_shapes=[pltpu.VMEM(scr_shape, jnp.float32),
                            pltpu.SemaphoreType.DMA((2,))],
        )(a))
        dt = rec(f"kernel_t_p{pack}_lt{lt}", fn, x3)
        if dt is not None:
            got = fn(x3).reshape(b, m, nfr)
            ok = bool(jnp.all(got == r_swap))
            print(f"  parity vs swap: {ok}", flush=True)

    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
