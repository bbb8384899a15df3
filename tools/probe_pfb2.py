"""Phase/ablation probe for the fused PFB bank on the real TPU.

Isolates: frames_t transposes, the fused FM kernel at several tile sizes
and precisions, the bare channelizer (2-plane output), and the audio
decimator — to find where the bank's 17 ms/call actually goes.

Run:  python -m tools.probe_pfb2
"""

import json
import time

import numpy as np


def timeit(fn, *args, iters=8):
    import jax.numpy as jnp
    out = fn(*args)
    leaf = out[0] if isinstance(out, tuple) else out
    while isinstance(leaf, tuple):
        leaf = leaf[0]
    float(jnp.sum(leaf.ravel()[:1]))
    start = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    leaf = out[0] if isinstance(out, tuple) else out
    while isinstance(leaf, tuple):
        leaf = leaf[0]
    float(jnp.sum(leaf.ravel()[:1]))
    t_loop = time.perf_counter() - start
    start = time.perf_counter()
    float(jnp.sum(leaf.ravel()[:1]))
    t_fetch = time.perf_counter() - start
    return max(t_loop - t_fetch, 1e-9) / iters


def main():
    import jax
    import jax.numpy as jnp
    from simpledsp_tpu.kernels.pfb import (halo_frames, pfb_am_frames,
                                           pfb_channelize_frames,
                                           pfb_fm_frames)
    from simpledsp_tpu.models.sdr import FMReceiverBank

    b, t, m = 16, 1 << 20, 16
    bank = FMReceiverBank(m, fs=1.6e6, use_pallas=True)
    g = t // m
    halo = halo_frames(bank.chan.taps_per_branch, False)
    rng = np.random.default_rng(0)
    xr = jnp.asarray(rng.standard_normal((b, t)).astype(np.float32))
    xi = jnp.asarray(rng.standard_normal((b, t)).astype(np.float32))
    st = bank.init_state(b)
    xpr = jnp.concatenate([st.chan.hist_r, xr], axis=-1)
    xpi = jnp.concatenate([st.chan.hist_i, xi], axis=-1)
    ops = bank.chan.kernel_ops
    pr = st.demod.prev_r[..., None]
    pi = st.demod.prev_i[..., None]

    results = {}

    def rec(name, fn, *args, samples=b * t):
        try:
            dt = timeit(fn, *args)
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__}: {str(e)[:200]}",
                  flush=True)
            return
        results[name] = {"ms": round(dt * 1e3, 3),
                         "Msps": round(samples / dt / 1e6, 1)}
        print(f"{name}: {dt*1e3:.3f} ms = {samples/dt/1e6:.0f} Ms/s",
              flush=True)

    # Full bank forward (reference point).
    rec("bank_full", jax.jit(bank._forward), xr, xi, st)

    # frames_t transposes alone (both planes).
    def ftr(ar, ai):
        return (bank.chan.frames_t(ar, g + halo),
                bank.chan.frames_t(ai, g + halo))
    rec("frames_t", jax.jit(ftr), xpr, xpi)

    xtr, xti = jax.jit(ftr)(xpr, xpi)
    xtr.block_until_ready()

    # Fused FM kernel alone at two tile sizes.
    for gt in (1024, 2048):
        fn = jax.jit(lambda a, c, d, e, gt=gt: pfb_fm_frames(
            ops, a, c, d, e, gain=bank.fm_gain, g=g, g_tile=gt))
        rec(f"fm_kernel_gt{gt}", fn, xtr, xti, pr, pi)

    # DEFAULT-precision DFT dots (1-pass bf16): MXU share of the kernel.
    fn = jax.jit(lambda a, c, d, e: pfb_fm_frames(
        ops, a, c, d, e, gain=bank.fm_gain, g=g,
        precision=jax.lax.Precision.DEFAULT))
    rec("fm_kernel_default", fn, xtr, xti, pr, pi)

    # Unpacked control (pack=1): the old per-stream MXU shape.
    fn = jax.jit(lambda a, c, d, e: pfb_fm_frames(
        ops, a, c, d, e, gain=bank.fm_gain, g=g, pack=1))
    rec("fm_kernel_pack1", fn, xtr, xti, pr, pi)

    # Bare channelizer (2-plane output) and AM (1-plane, no atan2).
    rec("chan_kernel",
        jax.jit(lambda a, c: pfb_channelize_frames(ops, a, c, g=g)),
        xtr, xti)
    rec("am_kernel", jax.jit(lambda a, c: pfb_am_frames(ops, a, c, g=g)),
        xtr, xti)

    # Audio decimator alone on a disc-shaped input.
    disc = jnp.asarray(rng.standard_normal((b, m, g)).astype(np.float32))
    rec("audio_decim", jax.jit(lambda d, s: bank.audio(d, s)), disc,
        st.audio, samples=b * g * m)

    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
