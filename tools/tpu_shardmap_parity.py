"""Execute the COMPILED Pallas-under-shard_map chain on the real TPU chip.

The CPU suite necessarily runs the fused sharded path with
``interpret=True`` and ``check_vma`` relaxed (Pallas interpret mode loses
vma on its grid-loop carries).  This script runs the exact pod code path —
``ShardedNorthStarChain`` with ``interpret=False`` and ``check_vma=True``
on a (dp=1, sp=1) mesh over the one real chip — and proves parity with the
serial ``NorthStarChain`` plus streaming-state consistency.

Run:  python -m tools.tpu_shardmap_parity          (from the repo root)
Exit 0 on parity; prints one JSON line with the max deviations.
"""

import json
import sys


def main() -> int:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from simpledsp_tpu.models.northstar import (NorthStarChain,
                                                ShardedNorthStarChain)
    from simpledsp_tpu.parallel.mesh import make_mesh
    from simpledsp_tpu.utils.host import to_numpy

    dev = jax.devices()[0]
    if dev.platform not in ("tpu", "axon"):
        print(f"not a TPU backend: {dev}", file=sys.stderr)
        return 2

    mesh = make_mesh(dp=1, sp=1)
    c, t, nfft = 2, 8 * 4096, 4096
    rng = np.random.default_rng(7)
    x = rng.standard_normal((c, t)).astype(np.float32)

    serial = NorthStarChain(fft_size=nfft, block_size=256, dtype=jnp.float32)
    sharded = ShardedNorthStarChain(mesh, fft_size=nfft, block_size=256,
                                    dtype=jnp.float32)
    assert serial._fused_ops is not None, "fused path not selected on TPU"
    assert sharded._fused_ops is not None, "fused sharded path not selected"
    assert sharded._interpret is False, "must run COMPILED (interpret=False)"

    xs = jnp.asarray(x)
    (ar, ai), s_a = serial(xs)
    (br, bi), s_b = sharded(xs)
    dr = float(np.abs(to_numpy(ar) - to_numpy(br)).max())
    di = float(np.abs(to_numpy(ai) - to_numpy(bi)).max())
    ds = float(np.abs(to_numpy(s_a.y_hist) - to_numpy(s_b.y_hist)).max())

    # Streaming across two sharded calls == one long sharded call.
    (cr1, ci1), st = sharded(xs[:, : t // 2])
    (cr2, ci2), st = sharded(xs[:, t // 2:], st)
    two = np.concatenate([to_numpy(cr1), to_numpy(cr2)], axis=1)
    d_stream = float(np.abs(two - to_numpy(br)).max())

    scale = float(np.abs(to_numpy(br)).max())
    ok = max(dr, di, d_stream) < 1e-4 * scale and ds < 1e-4

    # dp-sharded FM bank: COMPILED fused kernel under shard_map with
    # check_vma=True (the kernels/pfb.py vma annotations) — must be
    # bit-identical to the serial fused bank.
    from simpledsp_tpu.models.sdr import FMReceiverBank
    from simpledsp_tpu.parallel.sdr import ShardedReceiverBank

    bank = FMReceiverBank(16, fs=1.6e6, dtype=jnp.float32, use_pallas=True)
    sbank = ShardedReceiverBank(bank, mesh)
    zb = rng.standard_normal((2, 2, 16 * 2048)).astype(np.float32)
    a_ser, st_ser = bank((jnp.asarray(zb[0]), jnp.asarray(zb[1])))
    a_sh, st_sh = sbank((jnp.asarray(zb[0]), jnp.asarray(zb[1])))
    d_bank = float(np.abs(to_numpy(a_ser) - to_numpy(a_sh)).max())
    ok = ok and d_bank == 0.0

    print(json.dumps({
        "compiled_shardmap_parity": bool(ok),
        "interpret": False, "check_vma": True,
        "max_re_dev": dr, "max_im_dev": di, "state_dev": ds,
        "stream_dev": d_stream, "spectra_scale": scale,
        "bank_dev": d_bank,
        "device": str(dev),
    }))
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
