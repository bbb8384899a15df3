"""Row-tile scaling of the flat FM kernel DMA stage + full fused path
(one process, interleaved): is the 2.2 ms DMA-ring floor per-step
overhead (shrinks with bigger tiles) or bandwidth-bound?

Run:  python -m tools.probe_bank_dma
"""
import functools
import json

import numpy as np

from tools.timing import timeit_chained

def main():
    import jax
    import jax.numpy as jnp
    from simpledsp_tpu.kernels.pfb import flat_pad_to, pfb_fm_flat
    from simpledsp_tpu.models.sdr import FMReceiverBank

    b, t, m = 16, 1 << 20, 16
    bank = FMReceiverBank(m, fs=1.6e6, use_pallas=False)
    ops = bank.chan.kernel_ops
    g = t // m
    w = flat_pad_to(ops, g)
    rng = np.random.default_rng(0)
    xpr = jnp.asarray(rng.standard_normal((b, w)).astype(np.float32))
    xpi = jnp.asarray(rng.standard_normal((b, w)).astype(np.float32))
    pr = jnp.zeros((b, m, 1), jnp.float32)
    pi = jnp.zeros((b, m, 1), jnp.float32)
    ah = jnp.zeros((b, m, bank._ataps.size - 1), jnp.float32)

    def timeit(fn, iters=8):
        return timeit_chained(
            lambda c: fn(xpr, xpi, c[0], c[1])[1], (pr, pi), iters=iters)

    fns = {}
    for rt in (128, 256, 512):
        fns[f"dma_rt{rt}"] = jax.jit(functools.partial(
            pfb_fm_flat, ops, gain=bank.fm_gain, g=g, row_tile=rt,
            _debug_stage="dma"))
        def dec_fn(ar, ai, cr, ci, _rt=rt):
            audio, carry, _ = pfb_fm_flat(
                ops, ar, ai, cr, ci, gain=bank.fm_gain, g=g, row_tile=_rt,
                dec_taps=bank._ataps, decim=bank.decim, ahist=ah)
            return audio, carry
        fns[f"dec_rt{rt}"] = jax.jit(dec_fn)
    res = {}
    for rep in range(3):
        for name, fn in fns.items():
            try:
                dt = timeit(fn)
            except Exception as e:
                print(f"{name}: FAIL {type(e).__name__}: {str(e)[:200]}", flush=True)
                fns[name] = None
                continue
            res.setdefault(name, []).append(dt * 1e3)
            print(f"{name} rep{rep}: {dt*1e3:.3f} ms", flush=True)
    med = {k: round(float(np.median(v)), 3) for k, v in res.items() if v}
    print(json.dumps({"median_ms": med,
                      "Msps": {k: round(b*t/(v/1e3)/1e6, 1)
                               for k, v in med.items()}}), flush=True)

if __name__ == "__main__":
    main()
