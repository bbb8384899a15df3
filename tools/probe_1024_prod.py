"""Production-path chain layout/pin matrix: layout (reg/k1) x
output-layout pin (row-major / (0,2,1) / kernel-emission (2,0,1) /
none) x flat_out, one process, chained medians.  Round-5 findings: at
1024 the (2,0,1) emission-order pin turns the k1 reorder into a free
layout relabel (6.6 ms vs reg+pin 9.2).

Run:  python -m tools.probe_1024_prod [fft_size]
"""

import functools
import json

import numpy as np

from tools.timing import timeit_chained


def main():
    import sys

    import jax
    import jax.numpy as jnp
    from jax.experimental.layout import Format, Layout
    from jax.sharding import SingleDeviceSharding
    from simpledsp_tpu.kernels import chain as kchain
    from simpledsp_tpu.models.northstar import NorthStarChain

    c, t = 64, 1 << 20
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    chain = NorthStarChain(fft_size=n, block_size=256, dtype=jnp.float32)
    ops = chain._fused_ops
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((c, t // n, ops.n1, ops.n2))
                    .astype(np.float32))
    s0 = jnp.zeros((c, 2 * (chain.design.nsections + 1)), jnp.float32)
    dev = SingleDeviceSharding(jax.local_devices()[0])
    rm = Format(Layout(major_to_minor=(0, 1, 2)), dev)
    km = Format(Layout(major_to_minor=(0, 2, 1)), dev)
    kn = Format(Layout(major_to_minor=(2, 0, 1)), dev)

    def fwd(layout, flat, xx, ss):
        return kchain.fused_chain_frames(
            ops, xx, ss, half_spectrum=True, flat_out=flat, layout=layout)

    fns = {}
    for layout in ("reg", "k1"):
        for flat in (True, False):
            for pin in (True, False):
                if pin and not flat:
                    continue   # the pin targets the 3-D flat planes
                f = functools.partial(fwd, layout, flat)
                fns[f"{layout}_flat{int(flat)}_pin{int(pin)}"] = (
                    jax.jit(f, out_shardings=((rm, rm), None)) if pin
                    else jax.jit(f))
    fk = functools.partial(fwd, "k1", True)
    fns["k1_flat1_pinK"] = jax.jit(fk, out_shardings=((km, km), None))
    fns["k1_flat1_pinN"] = jax.jit(fk, out_shardings=((kn, kn), None))

    def timeit(fn, iters=12):
        return timeit_chained(lambda s: fn(x, s)[1], s0, iters=iters)

    res = {}
    for rep in range(3):
        for name, fn in fns.items():
            dt = timeit(fn)
            res.setdefault(name, []).append(dt * 1e3)
            print(f"{name} rep{rep}: {dt*1e3:.3f} ms", flush=True)
    med = {k: round(float(np.median(v)), 3) for k, v in res.items()}
    print(json.dumps({"median_ms": med,
                      "Gsps": {k: round(c * t / (v / 1e3) / 1e9, 2)
                               for k, v in med.items()}}), flush=True)


if __name__ == "__main__":
    main()
