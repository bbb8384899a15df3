"""Probe Mosaic lowering support for kernel building blocks on the real
TPU: two-contracting-dim dot_general, sublane concat, tiny-lane DMA."""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def probe(name, fn):
    try:
        out = fn()
        out = jax.block_until_ready(out)
        v = float(np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
        print(f"{name}: OK (v={v:.4f})", flush=True)
        return True
    except Exception as e:
        print(f"{name}: FAIL {type(e).__name__}: {str(e)[:200]}", flush=True)
        return False


def main():
    r, nb, d = 16, 32, 10
    rng = np.random.default_rng(0)
    kxx = jnp.asarray(rng.standard_normal((64, nb, d)), jnp.float32)
    u4 = jnp.asarray(rng.standard_normal((nb, d, nb, d)), jnp.float32)
    x = jnp.asarray(rng.standard_normal((64, nb, 128)), jnp.float32)
    sf = jnp.asarray(rng.standard_normal((64, d)), jnp.float32)
    kt = jnp.asarray(rng.standard_normal((d, 128)), jnp.float32)

    # 1. two-contracting-dims dot_general: (r,j,e) x (j,e,p,d) -> (r,p,d)
    def k1(kxx_ref, u4_ref, o_ref):
        o_ref[:] = jax.lax.dot_general(
            kxx_ref[:], u4_ref[:],
            dimension_numbers=(((1, 2), (0, 1)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)

    def run1():
        return pl.pallas_call(
            k1, grid=(4,),
            in_specs=[pl.BlockSpec((r, nb, d), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((nb, d, nb, d), lambda i: (0, 0, 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((r, nb, d), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((64, nb, d), jnp.float32),
        )(kxx, u4)
    ok1 = probe("dot_general 2-contract", run1)
    if ok1:
        ref = jnp.einsum("rje,jepd->rpd", kxx, u4,
                         precision=jax.lax.Precision.HIGHEST)
        got = run1()
        print("   max err:", float(jnp.max(jnp.abs(got - ref))), flush=True)

    # 2. sublane concat: (r,1,d) + (r,31,d) -> (r,32,d) then dot with x
    def k2(x_ref, sf_ref, kt_ref, o_ref):
        dot_lane = functools.partial(
            jax.lax.dot_general,
            dimension_numbers=(((2,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)
        kx = dot_lane(x_ref[:], kt_ref[:])        # (r, nb, d)
        kxx = jnp.concatenate([sf_ref[:][:, None, :], kx[:, :nb - 1]],
                              axis=1)
        o_ref[:] = kxx

    def run2():
        return pl.pallas_call(
            k2, grid=(4,),
            in_specs=[pl.BlockSpec((r, nb, 128), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((r, d), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((d, 128), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((r, nb, d), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((64, nb, d), jnp.float32),
        )(x, sf, kt)
    ok2 = probe("kx + sublane concat", run2)
    if ok2:
        kx = jnp.einsum("rjt,dt->rjd", x, kt,
                        precision=jax.lax.Precision.HIGHEST)
        ref = jnp.concatenate([sf[:, None, :], kx[:, :nb - 1]], axis=1)
        print("   max err:",
              float(jnp.max(jnp.abs(run2() - ref))), flush=True)

    # 3. DMA rate of a (f, nb, d) packed buffer as (r, nb, d) blocks
    big = jnp.asarray(rng.standard_normal((16384, nb, d)), jnp.float32)

    def k3(s_ref, o_ref):
        o_ref[:] = jnp.sum(s_ref[:], axis=(1, 2), keepdims=True)[:, :, 0]

    def run3():
        return pl.pallas_call(
            k3, grid=(16384 // r,),
            in_specs=[pl.BlockSpec((r, nb, d), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((r, 1), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((16384, 1), jnp.float32),
        )(big)
    if probe("(r,32,10) block DMA", run3):
        f = jax.jit(run3)
        o = f(); float(jnp.sum(o))
        t0 = time.perf_counter()
        for _ in range(20):
            o = f()
        float(jnp.sum(o))
        dt = (time.perf_counter() - t0) / 20
        gb = big.size * 4 / dt / 1e9
        print(f"   {dt*1e3:.3f} ms -> {gb:.0f} GB/s effective", flush=True)


def main_transpose():
    """In-kernel (k1, r, k2) -> (r, k2, k1) value transpose + 32-lane
    store: can the chain kernel emit natural bin order directly, and at
    what effective bandwidth vs the XLA transpose (~143 GB/s measured)?"""
    r, n1, n2, f = 16, 32, 128, 4096
    rng = np.random.default_rng(0)
    big = jnp.asarray(rng.standard_normal((n1, f, n2)), jnp.float32)

    def k4(x_ref, o_ref):
        o_ref[:] = jnp.transpose(x_ref[:], (1, 2, 0))

    def run4():
        return pl.pallas_call(
            k4, grid=(f // r,),
            in_specs=[pl.BlockSpec((n1, r, n2), lambda i: (0, i, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((r, n2, n1), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((f, n2, n1), jnp.float32),
        )(big)

    if probe("in-kernel (1,2,0) transpose", run4):
        got = np.asarray(run4())
        ref = np.asarray(big).transpose(1, 2, 0)
        print("   max err:", float(np.abs(got - ref).max()), flush=True)
        fjit = jax.jit(run4)
        o = fjit(); float(jnp.sum(o[0]))
        t0 = time.perf_counter()
        for _ in range(20):
            o = fjit()
        float(jnp.sum(o[0]))
        dt = (time.perf_counter() - t0) / 20
        gb = 2 * big.size * 4 / dt / 1e9
        print(f"   {dt*1e3:.3f} ms -> {gb:.0f} GB/s effective", flush=True)

    # XLA baseline on the same shape.
    fx = jax.jit(lambda a: jax.lax.transpose(a, (1, 2, 0)))
    o = fx(big); float(jnp.sum(o[0]))
    t0 = time.perf_counter()
    for _ in range(20):
        o = fx(big)
    float(jnp.sum(o[0]))
    dt = (time.perf_counter() - t0) / 20
    print(f"xla transpose: {dt*1e3:.3f} ms -> "
          f"{2 * big.size * 4 / dt / 1e9:.0f} GB/s", flush=True)


if __name__ == "__main__":
    import sys
    if "--transpose" in sys.argv:
        main_transpose()
    else:
        main()
