"""Shared chained-loop timing for the on-chip probes/benches.

The protocol is subtle on the axon runtime and must be identical across
probes (PERF.md "Measurement methodology"): `block_until_ready` can
return before work executes through the tunnel, so the loop is synced by
FETCHING a value data-dependent on the final state, the one fetch
round-trip is calibrated out, and callers take the median of >= 3 reps
within ONE process (the tunnel drifts >1.5x run to run).
"""

import time

import numpy as np


def timeit_chained(step, state0, iters=8):
    """Seconds per call of ``step`` under pipelined chaining.

    ``step(state) -> state_next`` must thread a device value (the chain
    forces the whole dependency chain); ``state_next``'s first ndarray
    leaf is the sync anchor.  One warm-up call runs first.
    """
    import jax

    def sync(state):
        leaf = next(a for a in jax.tree_util.tree_leaves(state)
                    if hasattr(a, "ravel"))
        return float(np.asarray(leaf.ravel()[:1])[0])

    sync(step(state0))
    state = state0
    start = time.perf_counter()
    for _ in range(iters):
        state = step(state)
    sync(state)
    t_loop = time.perf_counter() - start
    start = time.perf_counter()
    sync(state)
    t_fetch = time.perf_counter() - start
    return max(t_loop - t_fetch, 1e-9) / iters


def median_ms(reps):
    return round(float(np.median(reps)) * 1e3, 3)
