"""Dump the optimized HLO around a minimal pallas_call to find hidden
layout-conversion copies on the axon/v5e backend."""

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    f_total, n1, n2, r = 16384, 32, 128, 32
    rng = np.random.default_rng(0)
    x3 = jnp.asarray(rng.standard_normal((f_total, n1, n2)), jnp.float32)

    def body(x_ref, o_ref):
        o_ref[:] = x_ref[:] * 2.0

    def fn(xx):
        return pl.pallas_call(
            body, grid=(f_total // r,),
            in_specs=[pl.BlockSpec((r, n1, n2), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((r, n1, n2), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((f_total, n1, n2), jnp.float32),
        )(xx)

    lowered = jax.jit(fn).lower(x3)
    try:
        txt = lowered.compile().as_text()
        kind = "optimized"
    except Exception as e:
        print(f"compile().as_text() failed: {e}")
        txt = lowered.as_text()
        kind = "stablehlo"
    print(f"=== {kind} ===")
    for line in txt.splitlines():
        ls = line.strip()
        if any(k in ls for k in ("copy", "custom-call", "transpose",
                                 "bitcast", "fusion(", "ENTRY", "layout")):
            print(ls[:240])


if __name__ == "__main__":
    main()
