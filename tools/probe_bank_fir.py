"""FIR-variant + row-tile shootout for the fused FM bank on the real TPU
(one process, interleaved): v1 (per-tap concat shifts) vs v2 (shift-reuse
rolled planes + dual accumulators), production fm_dec mode, plus rt=64
(decimator ext fits one 128-lane K-tile) vs the default rt=128.

Run:  python -m tools.probe_bank_fir
"""

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

    def make(variant, rt, stage=None):
        def fn(ar, ai, cr, ci):
            audio, carry, _ = pfb_fm_flat(
                ops, ar, ai, cr, ci, gain=bank.fm_gain, g=g, row_tile=rt,
                dec_taps=bank._ataps, decim=bank.decim, ahist=ah,
                fir_variant=variant, _debug_stage=stage)
            return audio, carry
        return jax.jit(fn)

    fns = {
        "fir_v1": make("v1", 128, "fir"),
        "fir_v2": make("v2", 128, "fir"),
        "full_v1_rt128": make("v1", 128),
        "full_v2_rt128": make("v2", 128),
        "full_v2_rt64": make("v2", 64),
        "full_v1_rt64": make("v1", 64),
    }
    res = {}
    for rep in range(3):
        for name, fn in list(fns.items()):
            if fn is None:
                continue
            try:
                dt = timeit(fn)
            except Exception as e:
                print(f"{name}: FAIL {type(e).__name__}: {str(e)[:160]}",
                      flush=True)
                fns[name] = None
                continue
            res.setdefault(name, []).append(dt * 1e3)
            print(f"{name} rep{rep}: {dt*1e3:.3f} ms", flush=True)
    med = {k2: round(float(np.median(v)), 3) for k2, v in res.items()}
    print(json.dumps({"median_ms": med,
                      "Msps": {k2: round(b * t / (v / 1e3) / 1e6, 1)
                               for k2, v in med.items()}}), flush=True)


if __name__ == "__main__":
    main()
