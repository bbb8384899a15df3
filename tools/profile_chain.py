"""jax.profiler trace of the chain and FM bank through the axon tunnel.

Captures one traced window of the chained streaming loop for (a) the
north-star chain and (b) the FM receiver bank, then prints the per-op
device-time table (tools/trace_summary.py) — the measured basis for
PERF.md's phase attribution.

Run:  python -m tools.profile_chain
"""

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from simpledsp_tpu.models.northstar import NorthStarChain
    from simpledsp_tpu.models.sdr import FMReceiverBank
    from tools.trace_summary import summarize

    rng = np.random.default_rng(0)

    # ---- chain ----
    c, t = 64, 1 << 20
    # precision=None -> the production HIGHEST config bench.py runs.
    chain = NorthStarChain(fft_size=4096, block_size=256,
                           dtype=jnp.float32, precision=None)
    x = chain.frame_input(rng.standard_normal((c, t)).astype(np.float32))
    s0 = jnp.zeros((c, 2 * (chain.design.nsections + 1)), jnp.float32)
    fwd = chain._jit   # the pinned-output-layout production jit
    out, s = fwd(x, s0)
    float(jnp.sum(s))                      # warm + sync (value fetch)
    with jax.profiler.trace("/tmp/sdsp_trace_chain"):
        s = s0
        for _ in range(4):
            out, s = fwd(x, s)
        float(jnp.sum(s))
    del out

    # ---- FM bank ----
    b, tb, m = 16, 1 << 20, 16
    bank = FMReceiverBank(m, fs=1.6e6)
    xr = jnp.asarray(rng.standard_normal((b, tb)).astype(np.float32))
    xi = jnp.asarray(rng.standard_normal((b, tb)).astype(np.float32))
    st = bank.init_state(b)
    fwd_b = jax.jit(bank._forward)
    audio, st2 = fwd_b(xr, xi, st)
    float(jnp.sum(st2.demod.prev_r.ravel()[:1]))
    with jax.profiler.trace("/tmp/sdsp_trace_bank"):
        stc = st
        for _ in range(4):
            audio, stc = fwd_b(xr, xi, stc)
        float(jnp.sum(stc.demod.prev_r.ravel()[:1]))
    del audio

    summarize("/tmp/sdsp_trace_chain")
    summarize("/tmp/sdsp_trace_bank")


if __name__ == "__main__":
    main()
