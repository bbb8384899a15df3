"""Bisect the fused-vs-XLA FMReceiverBank divergence stage by stage on TPU."""

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from simpledsp_tpu.kernels.pfb import halo_frames, pfb_fm_frames
    from simpledsp_tpu.models.sdr import FMReceiverBank
    from simpledsp_tpu.ops.demod import fm_demod_ri
    from simpledsp_tpu.utils.host import to_numpy

    b, t, m = 16, 16 * 2048, 16
    n = np.arange(t)
    z = np.zeros(t, dtype=np.complex128)
    for c in range(m):
        phase = (2 * np.pi * ((c + 0.31) / m) * n
                 + 3.0 * np.sin(2 * np.pi * (0.2 + 0.03 * c) / 257.0 * n))
        z += np.exp(1j * phase)
    xr = jnp.asarray(np.broadcast_to(z.real, (b, t)).astype(np.float32))
    xi = jnp.asarray(np.broadcast_to(z.imag, (b, t)).astype(np.float32))

    fused = FMReceiverBank(m, fs=1.6e6, use_pallas=True)
    plain = FMReceiverBank(m, fs=1.6e6, use_pallas=False)
    st = fused.init_state(b)

    def fused_disc(xr, xi, state):
        g = fused._fused_g(xr.shape[-1])
        halo = halo_frames(fused.chan.taps_per_branch, False)
        xpr, xpi, chan_state = fused._prefix(xr, xi, state)
        disc, (ylr, yli) = pfb_fm_frames(
            fused.chan.kernel_ops, fused.chan.frames_t(xpr, g + halo),
            fused.chan.frames_t(xpi, g + halo),
            state.demod.prev_r[..., None], state.demod.prev_i[..., None],
            gain=fused.fm_gain, g=g, interpret=False)
        return disc

    def plain_disc(xr, xi, state):
        (ir, ii), _ = plain.chan.process_ri_cm(xr, xi, state.chan)
        disc, _ = fm_demod_ri(ir, ii, state.demod, gain=plain.fm_gain)
        return disc

    d1 = to_numpy(jax.jit(fused_disc)(xr, xi, st))
    d2 = to_numpy(jax.jit(plain_disc)(xr, xi, st))
    dd = np.abs(d1 - d2)
    print(f"disc dev: max {dd.max():.3e} scale {np.abs(d2).max():.3e}",
          flush=True)
    print("per-channel disc dev:",
          np.array2string(dd.max(axis=(0, 2)), precision=2), flush=True)
    print("per-batch disc dev:",
          np.array2string(dd.max(axis=(1, 2)), precision=2), flush=True)
    gdev = dd.max(axis=(0, 1))
    print("per-256-frame disc dev:",
          np.array2string(gdev.reshape(-1, 256).max(axis=1), precision=2),
          flush=True)

    a1, _ = jax.jit(fused._forward)(xr, xi, st)
    a2, _ = jax.jit(plain._forward)(xr, xi, st)
    da = np.abs(to_numpy(a1) - to_numpy(a2))
    print(f"audio dev: max {da.max():.3e} scale "
          f"{np.abs(to_numpy(a2)).max():.3e}", flush=True)
    print("per-channel audio dev:",
          np.array2string(da.max(axis=(0, 2)), precision=2), flush=True)
    i = np.unravel_index(np.argmax(da), da.shape)
    print(f"audio argmax {i}: fused {to_numpy(a1)[i]:.4f} "
          f"plain {to_numpy(a2)[i]:.4f}", flush=True)
    sl = np.s_[i[0], i[1], max(0, i[2] - 3): i[2] + 4]
    print("fused:", np.array2string(to_numpy(a1)[sl], precision=4))
    print("plain:", np.array2string(to_numpy(a2)[sl], precision=4))


if __name__ == "__main__":
    main()
