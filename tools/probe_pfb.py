"""Isolate the compiled-vs-interpret PFB kernel divergence on TPU.

Runs the bare channelizer kernel and the fused FM kernel against the XLA
oracle on a small block, printing max deviation per grid-tile quarter so a
seam/carry bug shows up as a localized error.
"""

import numpy as np


def dev_map(a, b, gt, name):
    a = np.asarray(a)
    b = np.asarray(b)
    d = np.abs(a - b)
    print(f"{name}: max {d.max():.3e}  (scale {np.abs(b).max():.3e})",
          flush=True)
    g = a.shape[-1]
    for lo in range(0, g, gt):
        seg = d[..., lo: lo + gt]
        print(f"  frames [{lo:5d},{lo + gt:5d}): max {seg.max():.3e} "
              f"argmax lane {lo + int(np.argmax(seg.max(axis=(0, 1))))}",
              flush=True)


def main():
    import jax
    import jax.numpy as jnp
    from simpledsp_tpu.kernels.pfb import halo_frames, pfb_channelize_frames, \
        pfb_fm_frames
    from simpledsp_tpu.ops.channelizer import PFBChannelizer
    from simpledsp_tpu.ops.demod import DemodStateRI, fm_demod_ri
    from simpledsp_tpu.utils.host import to_numpy

    B, M, T = 2, 16, 16 * 1024
    g = T // M
    chan = PFBChannelizer(M, taps_per_channel=16, dtype=jnp.float32)
    rng = np.random.default_rng(1)
    xr = jnp.asarray(rng.standard_normal((B, T)).astype(np.float32))
    xi = jnp.asarray(rng.standard_normal((B, T)).astype(np.float32))
    z = jnp.zeros((B, chan.hist_len), dtype=xr.dtype)
    halo = halo_frames(chan.taps_per_branch, False)
    ftr = chan.frames_t(jnp.concatenate([z, xr], axis=-1), g + halo)
    fti = chan.frames_t(jnp.concatenate([z, xi], axis=-1), g + halo)

    (yr, yi), _ = jax.jit(lambda a, b: chan.process_ri_cm(a, b))(xr, xi)

    gt = 256
    kr, ki = jax.jit(lambda a, b: pfb_channelize_frames(
        chan.kernel_ops, a, b, g=g, g_tile=gt))(ftr, fti)
    dev_map(to_numpy(kr), to_numpy(yr), gt, "chan re")
    dev_map(to_numpy(ki), to_numpy(yi), gt, "chan im")

    st0 = DemodStateRI(jnp.ones((B, M), jnp.float32),
                       jnp.zeros((B, M), jnp.float32))
    ref, _ = jax.jit(lambda a, b: fm_demod_ri(a, b, st0, gain=2.5))(yr, yi)
    disc, _ = jax.jit(lambda a, b: pfb_fm_frames(
        chan.kernel_ops, a, b, st0.prev_r[..., None], st0.prev_i[..., None],
        gain=2.5, g=g, g_tile=gt))(ftr, fti)
    dev_map(to_numpy(disc), to_numpy(ref), gt, "fm disc")


if __name__ == "__main__":
    main()
