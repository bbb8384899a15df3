"""Fused FM bank across prototype/bank shapes on the real TPU: parity
(fused vs XLA masked-conv path) + padded-entry throughput for
M=16/K=16 (flagship), K=32 (deep prototype — exercises the adaptive
Mosaic scoped-vmem raise in kernels/pfb.py), M=8 (pack=16) and M=32
(pack=4).  The reference benches two sizes/radices of its FFT
(test/testFFT.cpp:237-256); this is the banks' analog.

Run:  python -m tools.bench_bank_configs
"""

import json
import time

import numpy as np

CONFIGS = [
    {"m": 16, "k": 16},
    {"m": 16, "k": 32},
    {"m": 8, "k": 16},
    {"m": 32, "k": 16},
]


def main():
    import jax
    import jax.numpy as jnp
    from simpledsp_tpu.models.sdr import FMReceiverBank
    from simpledsp_tpu.utils.host import to_numpy

    b, t = 16, 1 << 20
    rng = np.random.default_rng(0)
    results = {}
    for cfg in CONFIGS:
        m, k = cfg["m"], cfg["k"]
        name = f"fm_m{m}_k{k}"
        fused = FMReceiverBank(m, fs=1.6e6, taps_per_channel=k,
                               use_pallas=True)
        plain = FMReceiverBank(m, fs=1.6e6, taps_per_channel=k,
                               use_pallas=False)
        st = fused.init_state(b)
        # Constant-envelope carriers (the bench_banks.py parity input:
        # white noise would measure atan2 conditioning, not the kernel).
        n = np.arange(16 * 2048)
        z = np.zeros(n.size, dtype=np.complex128)
        for c in range(m):
            z += np.exp(1j * (2 * np.pi * ((c + 0.002) / m) * n
                              + 2.0 * np.sin(2 * np.pi * (0.2 + 0.03 * c)
                                             / 257.0 * n)))
        zb = np.broadcast_to(z, (b, n.size))
        xr_s = jnp.asarray(zb.real.astype(np.float32))
        xi_s = jnp.asarray(zb.imag.astype(np.float32))
        a1, _ = jax.jit(fused._forward)(xr_s, xi_s, st)
        a2, _ = jax.jit(plain._forward)(xr_s, xi_s, st)
        dev = float(np.abs(to_numpy(a1) - to_numpy(a2)).max())
        scale = float(np.abs(to_numpy(a2)).max())
        ok = dev < 1e-3 * max(scale, 1.0)
        print(f"{name}: parity dev {dev:.3e} (scale {scale:.3e}) "
              f"{'OK' if ok else 'FAIL'}", flush=True)
        if not ok:
            raise AssertionError(f"{name} fused path diverges")

        # Padded-entry chained throughput at the full 1M-sample stream.
        front, total = fused.padded_spec(t)
        br = np.zeros((b, total), np.float32)
        bi = np.zeros((b, total), np.float32)
        xw = rng.standard_normal((b, t)).astype(np.float32)
        br[:, front:front + t] = xw
        bi[:, front:front + t] = xw[::-1]
        planes = (jnp.asarray(br), jnp.asarray(bi))
        st2 = fused.init_state(b)
        reps = []
        for _ in range(3):
            out, s2, pl_ = fused.process_padded(planes, st2)
            float(np.asarray(s2.demod.prev_r.ravel()[0]))
            start = time.perf_counter()
            iters = 8
            for _ in range(iters):
                out, s2, pl_ = fused.process_padded(pl_, s2)
            float(np.asarray(s2.demod.prev_r.ravel()[0]))
            t_loop = time.perf_counter() - start
            start = time.perf_counter()
            float(np.asarray(s2.demod.prev_r.ravel()[0]))
            t_fetch = time.perf_counter() - start
            reps.append(max(t_loop - t_fetch, 1e-9) / iters)
            planes = pl_
        dt = sorted(reps)[1]
        msps = b * t / dt / 1e6
        results[name] = {"ms": round(dt * 1e3, 3), "Msps": round(msps, 1),
                         "parity_dev": dev, "scale": scale,
                         "reps_ms": [round(r * 1e3, 3) for r in reps]}
        print(f"{name}: {dt*1e3:.3f} ms = {msps:.0f} Ms/s", flush=True)
    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
