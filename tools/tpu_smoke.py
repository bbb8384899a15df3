"""Always-run compiled-path smoke check on the real TPU chip.

One process, three compiles, ~4 min through the axon tunnel:

  1. COMPILED fused chain (NorthStarChain) small block — SNR vs the f64
     scipy oracle (sosfilt + rfft), gate >= 130 dB.
  2. COMPILED Pallas-under-shard_map chain (ShardedNorthStarChain,
     interpret=False, check_vma=True) on a (dp=1, sp=1) mesh over the real
     chip — must match the serial chain bit-for-bit-scale (1e-4 rel).
  3. COMPILED dp-sharded FM receiver bank vs the serial fused bank —
     must be bit-identical.

Writes the JSON artifact (default TPU_SMOKE.json, override with argv[1])
so every round carries fresh evidence that the compiled path — not just
interpret mode — is correct.  bench.py additionally gates its own warm-up
output against the same oracle on every benchmark run.

Run:  python -m tools.tpu_smoke [artifact.json]     (from the repo root)
"""

import json
import sys


def main() -> int:
    import jax
    import jax.numpy as jnp
    import numpy as np
    import scipy.signal as sig

    from simpledsp_tpu.design.biquad import sos_matrix
    from simpledsp_tpu.models.northstar import (NorthStarChain,
                                                ShardedNorthStarChain)
    from simpledsp_tpu.models.sdr import FMReceiverBank
    from simpledsp_tpu.parallel.mesh import make_mesh
    from simpledsp_tpu.parallel.sdr import ShardedReceiverBank
    from simpledsp_tpu.utils.host import to_numpy

    out_path = sys.argv[1] if len(sys.argv) > 1 else "TPU_SMOKE.json"
    dev = jax.devices()[0]
    if dev.platform not in ("tpu", "axon"):
        print(f"not a TPU backend: {dev}", file=sys.stderr)
        return 2

    rng = np.random.default_rng(7)
    c, t, nfft = 2, 8 * 4096, 4096
    x = rng.standard_normal((c, t)).astype(np.float32)
    xs = jnp.asarray(x)

    # --- 1. compiled chain vs f64 oracle -------------------------------
    serial = NorthStarChain(fft_size=nfft, block_size=256,
                            dtype=jnp.float32)
    assert serial._fused_ops is not None, "fused path not selected on TPU"
    (ar, ai), s_a = serial(xs)
    got = (to_numpy(ar).astype(np.float64)
           + 1j * to_numpy(ai).astype(np.float64)).reshape(c, -1, nfft // 2)
    y64 = sig.sosfilt(sos_matrix(serial.design), x.astype(np.float64),
                      axis=-1)
    ref = np.fft.rfft(y64.reshape(c, -1, nfft))
    packed = ref[..., : nfft // 2].copy()
    packed[..., 0] += 1j * ref[..., nfft // 2].real
    err = got - packed
    snr_db = float(10 * np.log10((np.abs(packed) ** 2).sum()
                                 / max((np.abs(err) ** 2).sum(), 1e-300)))
    print(f"chain SNR vs f64 oracle: {snr_db:.1f} dB", flush=True)

    # --- 2. compiled shard_map parity ----------------------------------
    mesh = make_mesh(dp=1, sp=1)
    sharded = ShardedNorthStarChain(mesh, fft_size=nfft, block_size=256,
                                    dtype=jnp.float32)
    assert sharded._fused_ops is not None, "fused sharded path missing"
    assert sharded._interpret is False, "must run COMPILED"
    (br, bi), s_b = sharded(xs)
    scale = float(np.abs(to_numpy(ar)).max())
    d_shard = max(float(np.abs(to_numpy(ar) - to_numpy(br)).max()),
                  float(np.abs(to_numpy(ai) - to_numpy(bi)).max()))
    d_state = float(np.abs(to_numpy(s_a.y_hist) - to_numpy(s_b.y_hist)).max())
    print(f"shard_map dev: {d_shard:.3e} (scale {scale:.1f}), "
          f"state dev {d_state:.3e}", flush=True)

    # --- 3. compiled dp-sharded FM bank --------------------------------
    bank = FMReceiverBank(16, fs=1.6e6, dtype=jnp.float32, use_pallas=True)
    sbank = ShardedReceiverBank(bank, mesh)
    zb = rng.standard_normal((2, 2, 16 * 2048)).astype(np.float32)
    a_ser, _ = bank((jnp.asarray(zb[0]), jnp.asarray(zb[1])))
    a_sh, _ = sbank((jnp.asarray(zb[0]), jnp.asarray(zb[1])))
    d_bank = float(np.abs(to_numpy(a_ser) - to_numpy(a_sh)).max())
    print(f"bank dev: {d_bank:.3e}", flush=True)

    ok = (snr_db >= 130.0 and d_shard < 1e-4 * scale and d_state < 1e-4
          and d_bank == 0.0)
    record = {
        "compiled_smoke_ok": bool(ok),
        "chain_snr_db": round(snr_db, 1),
        "shard_dev": d_shard, "state_dev": d_state, "bank_dev": d_bank,
        "spectra_scale": scale,
        "interpret": False, "check_vma": True,
        "device": str(dev),
    }
    with open(out_path, "w") as f:
        f.write(json.dumps(record) + "\n")
    print(json.dumps(record))
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
