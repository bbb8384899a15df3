"""Chained-loop phase profile of the fused FM bank kernel on the real TPU
— the banks' analog of tools/probe_chain_phases.

Times each _debug_stage prefix of pfb_fm_flat (dma -> untranspose ->
branch FIR -> packed DFT -> discriminator) plus the fused-decimator
variant at the production config (B=16 streams x 1M complex samples,
M=16, K=16), with the headline methodology (chained calls threading the
phase carry, value-fetch sync, median of 3 interleaved reps).  Phase
cost = successive differences.  A pure input-read jit (sum of both
planes) anchors the DMA floor.

Run:  python -m tools.probe_bank_phases [K]
"""

import functools
import json
import sys

import numpy as np

from tools.timing import timeit_chained


def main():
    import jax
    import jax.numpy as jnp
    from simpledsp_tpu.kernels.pfb import flat_pad_to, pfb_fm_flat
    from simpledsp_tpu.models.sdr import FMReceiverBank

    k = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    b, t, m = 16, 1 << 20, 16
    bank = FMReceiverBank(m, fs=1.6e6, taps_per_channel=k,
                          use_pallas=False)
    ops = bank.chan.kernel_ops
    g = t // m
    w = flat_pad_to(ops, g)
    rng = np.random.default_rng(0)
    xpr = jnp.asarray(rng.standard_normal((b, w)).astype(np.float32))
    xpi = jnp.asarray(rng.standard_normal((b, w)).astype(np.float32))
    pr = jnp.zeros((b, m, 1), jnp.float32)
    pi = jnp.zeros((b, m, 1), jnp.float32)

    def read_floor(ar, ai, cr, ci):
        return None, (cr + jnp.sum(ar) * 0.0, ci + jnp.sum(ai) * 0.0)

    # All phase stages run in the PRODUCTION fm_dec mode (audio-rate
    # output writes); "full_fm" is the full-rate-write reference that
    # exposed the strided big-output write cost.
    stages = [("floor_read", "floor"), ("dma", "dma"),
              ("untrans", "untrans"), ("fir", "fir"), ("dft", "dft"),
              ("disc", "disc"), ("full_fm_dec", "full"),
              ("full_fm", "fm")]
    dec_taps = bank._ataps
    decim = bank.decim
    ah = jnp.zeros((b, m, dec_taps.size - 1), jnp.float32)

    def make_dec(st):
        def dec_fn(ar, ai, cr, ci):
            audio, carry, _aho = pfb_fm_flat(
                ops, ar, ai, cr, ci, gain=bank.fm_gain, g=g,
                dec_taps=dec_taps, decim=decim, ahist=ah,
                _debug_stage=st)
            return audio, carry
        return jax.jit(dec_fn)

    fns = {}
    for name, st in stages:
        if st == "floor":
            fns[name] = jax.jit(read_floor)
        elif st == "fm":
            fns[name] = jax.jit(functools.partial(
                pfb_fm_flat, ops, gain=bank.fm_gain, g=g))
        else:
            fns[name] = make_dec(None if st == "full" else st)
    results = {}
    for rep in range(3):
        for name, _ in stages:
            fn = fns[name]
            dt = timeit_chained(
                lambda carry, _f=fn: _f(xpr, xpi, carry[0], carry[1])[1],
                (pr, pi))
            results.setdefault(name, []).append(dt * 1e3)
            print(f"{name} rep{rep}: {dt*1e3:.3f} ms", flush=True)
    med = {kk: round(float(np.median(v)), 3) for kk, v in results.items()}
    msps = {kk: round(b * t / (v / 1e3) / 1e6, 1) for kk, v in med.items()}
    print(json.dumps({"K": k, "median_ms": med, "Msps": msps}), flush=True)
    order = [s[0] for s in stages]
    print("phase deltas (ms):", flush=True)
    for a2, b2 in zip(order[1:-1], order[2:]):
        print(f"  {b2} - {a2}: {med[b2] - med[a2]:+.3f}", flush=True)


if __name__ == "__main__":
    main()
