"""Weak-scaling benchmark of the sharded north-star chain.

North-star target (BASELINE.json): >= 90% weak-scaling efficiency at
N >= 2 hosts.  This environment has ONE physical TPU chip, so by default
this harness runs the mechanism (sharded program, state collective, halo)
on an N-device virtual CPU mesh and reports per-device throughput ratios —
a correctness/overhead check of the sharded program, NOT a hardware scaling
claim.  On a real pod (run with JAX_PLATFORMS=tpu and one process per host
after `parallel.multihost.initialize()`), the same script measures honest
weak scaling over ICI/DCN.

Prints one JSON line per mesh size plus a summary efficiency line.
"""

import json

import numpy as np


def main():
    import os

    import jax

    # Opt into real hardware with SCALING_BACKEND=tpu (on a pod, one process
    # per host, after parallel.multihost.initialize()).  Default: virtual
    # CPU mesh.  Configure BEFORE any backend initialization.
    if os.environ.get("SCALING_BACKEND", "cpu") == "tpu":
        hardware = f"{len(jax.devices())}x {jax.devices()[0].device_kind}"
    else:
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_num_cpu_devices", 8)
        try:
            import jax.extend.backend as _jb
            _jb.clear_backends()
        except Exception:
            pass
        hardware = "virtual-cpu-mesh (mechanism check, 1 real chip)"

    import jax.numpy as jnp
    from simpledsp_tpu.models.northstar import ShardedNorthStarChain
    from simpledsp_tpu.parallel import make_mesh
    from simpledsp_tpu.utils.benchmark import time_streaming

    rng = np.random.default_rng(0)
    c = 8
    t_per_dev = 1 << 16  # weak scaling: constant work per device
    results = []
    for sp in (1, 2, 4, 8):
        if sp > len(jax.devices()):
            break
        mesh = make_mesh(dp=1, sp=sp, devices=jax.devices()[:sp])
        chain = ShardedNorthStarChain(mesh, fft_size=4096, block_size=256,
                                      dtype=jnp.float32)
        t = sp * t_per_dev
        x = jnp.asarray(rng.standard_normal((c, t)), dtype=jnp.float32)

        def step(xv, st):
            return chain(xv, st)

        dt = time_streaming(step, x, None, iters=4, warmup=1)
        msps = c * t / dt / 1e6
        results.append((sp, msps))
        print(json.dumps({"metric": "sharded_chain_weak_scaling",
                          "devices": sp, "value": round(msps, 1),
                          "unit": "Msamples/s", "hardware": hardware}))

    if len(results) > 1:
        base = results[0][1]
        eff = [m / (base * sp) for sp, m in results]
        print(json.dumps({"metric": "weak_scaling_efficiency",
                          "value": round(min(eff[1:]), 3),
                          "unit": "fraction",
                          "per_mesh": {str(sp): round(e, 3)
                                       for (sp, _), e in zip(results, eff)},
                          "hardware": hardware,
                          "note": ("virtual CPU mesh exercises the sharded "
                                   "program only; real scaling needs a pod")}))


if __name__ == "__main__":
    main()
