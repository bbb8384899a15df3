"""Account the sharded programs' cross-device traffic from compiled HLO.

PERF.md claims the sharded chain's collectives are "negligible against
ICI"; this tool MEASURES the claim's inputs: it compiles each sharded
program at the production benchmark shapes over an 8-device mesh, parses
the optimized (post-SPMD) HLO for collective ops, sums their on-wire
bytes, and compares the implied ICI time (v5e: 45 GB/s one-way per link,
per the public scaling-book numbers) against the program's per-device
HBM traffic at the measured ~756 GB/s.

The mesh is a virtual CPU one (this machine has one chip), but the HLO
byte accounting is topology-independent: the same collectives with the
same shapes are emitted for a real sp=8 slice.

Run:  python -m tools.collective_budget
"""

import json
import re

import numpy as np

ICI_GBPS = 45.0        # v5e one-way per link (scaling-book figure)
HBM_GBPS = 756.0       # measured on this chip (PERF.md)

_COLL = re.compile(
    r"(\w+)\[([\d,]*)\][^ ]* "
    r"(all-gather|all-reduce|collective-permute|reduce-scatter|all-to-all)"
    r"\(")
_DTYPE_BYTES = {"f32": 4, "f64": 8, "bf16": 2, "f16": 2, "s32": 4,
                "u32": 4, "pred": 1, "c64": 8}


def _collectives(hlo_text: str):
    """(op, result_bytes) for every collective in the compiled module."""
    out = []
    for m in _COLL.finditer(hlo_text):
        dt, dims, op = m.group(1), m.group(2), m.group(3)
        n = int(np.prod([int(d) for d in dims.split(",")])) if dims else 1
        out.append((op, n * _DTYPE_BYTES.get(dt, 4)))
    return out


def _wire_bytes(op: str, nbytes: int, ndev: int) -> float:
    """Per-device on-wire bytes for a ring realization of the op."""
    if op == "all-gather":
        return nbytes * (ndev - 1) / ndev
    if op == "all-reduce":
        return 2.0 * nbytes * (ndev - 1) / ndev
    if op == "reduce-scatter":
        return nbytes * (ndev - 1) / ndev
    return float(nbytes)  # collective-permute / all-to-all: result size


def report(name: str, compiled, per_dev_hbm_bytes: float, ndev: int):
    colls = _collectives(compiled.as_text())
    wire = sum(_wire_bytes(op, b, ndev) for op, b in colls)
    by_op = {}
    for op, b in colls:
        by_op[op] = by_op.get(op, 0) + 1
    t_ici_us = wire / (ICI_GBPS * 1e9) * 1e6
    t_hbm_us = per_dev_hbm_bytes / (HBM_GBPS * 1e9) * 1e6
    rec = {
        "program": name,
        "collectives": by_op,
        "wire_bytes_per_dev_call": int(wire),
        "ici_time_us": round(t_ici_us, 3),
        "hbm_bytes_per_dev_call": int(per_dev_hbm_bytes),
        "hbm_time_us": round(t_hbm_us, 1),
        "ici_share_pct": round(100.0 * t_ici_us
                               / max(t_ici_us + t_hbm_us, 1e-12), 4),
    }
    print(json.dumps(rec))
    return rec


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    try:
        import jax.extend.backend as _jb
        _jb.clear_backends()
    except Exception:
        pass
    jax.config.update("jax_num_cpu_devices", 8)

    import jax.numpy as jnp
    from simpledsp_tpu.design.fir import lowpass_taps
    from simpledsp_tpu.models.northstar import ShardedNorthStarChain
    from simpledsp_tpu.parallel import (ShardedConvolve, ShardedFIR,
                                        ShardedSTFT, make_mesh)

    ndev = 8
    mesh = make_mesh(dp=1, sp=ndev, devices=jax.devices()[:ndev])
    rng = np.random.default_rng(0)
    c, t = 64, 1 << 20          # the production bench workload
    x = jnp.asarray(rng.standard_normal((c, t)), jnp.float32)
    xbytes = c * t * 4

    recs = []

    chain = ShardedNorthStarChain(mesh, fft_size=4096, block_size=256,
                                  dtype=jnp.float32)
    lowered = jax.jit(lambda a: chain(a)).lower(x)
    # Per-device HBM traffic: read local x twice (prepass + kernel), write
    # the spectrum planes once — ~3 local-shard sizes (PERF.md roofline).
    recs.append(report("sharded_chain_4096", lowered.compile(),
                       3.0 * xbytes / ndev, ndev))

    taps = lowpass_taps(301, 0.2, fs=1.0)
    fir = ShardedFIR(taps, mesh, dtype=jnp.float32)
    lowered = jax.jit(lambda a: fir(a)).lower(x)
    recs.append(report("sharded_fir_halo_301", lowered.compile(),
                       2.0 * xbytes / ndev, ndev))

    conv = ShardedConvolve(taps, mesh, dtype=jnp.float32)
    lowered = jax.jit(lambda a: conv(a)).lower(x)
    recs.append(report("sharded_convolve_301", lowered.compile(),
                       2.0 * xbytes / ndev, ndev))

    st = ShardedSTFT(mesh, nfft=1024, hop=512, dtype=jnp.float32)
    lowered = jax.jit(lambda a: st(a, padded=True)).lower(x)
    recs.append(report("sharded_stft_1024_padded", lowered.compile(),
                       3.0 * xbytes / ndev, ndev))
    # The unpadded form's trailing slice is uneven against the frame
    # sharding: under an enclosing jit the partitioner all-gathers both
    # spectrogram planes (the ShardedSTFT docstring's measured trap).
    lowered = jax.jit(lambda a: st(a)).lower(x)
    trap = report("sharded_stft_1024_UNPADDED_TRAP", lowered.compile(),
                  3.0 * xbytes / ndev, ndev)

    worst = max(r["ici_share_pct"] for r in recs)
    print(json.dumps({"summary": "worst-case ICI share of per-call time",
                      "value_pct": worst,
                      "unpadded_stft_trap_pct": trap["ici_share_pct"],
                      "note": ("byte accounting from compiled post-SPMD "
                               "HLO; ICI 45 GB/s/link (v5e), HBM 756 GB/s "
                               "measured")}))


if __name__ == "__main__":
    main()
