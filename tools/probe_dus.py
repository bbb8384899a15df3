"""Probe: in-place DUS on a donated buffer vs full-stream prefix concat.

The SDR banks' flat kernels read a [hist(255) | x | pad(769)] prefixed
stream; building it with jnp.concatenate costs a full read+write of the
stream every call.  XLA does dynamic_update_slice IN PLACE on a donated
input (standard aliasing), so a producer that uploads x at offset 255 of
the padded buffer lets the model patch JUST the 255-sample history.

MEASURED on v5e through the axon tunnel (this probe, chained loops with
the returned buffer re-threaded as the next call's donated input):
DUS ~0.09-0.10 ms/call vs concat ~0.41-0.68 ms/call at (16, 1M) f32 —
the aliasing survives the tunnel runtime.  models/sdr.py process_padded
is the production form.

Run from the repo root:  python -m tools.probe_dus
"""

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    b, t, h, tail = 16, 1 << 20, 255, 769
    w = h + t + tail
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((b, t)).astype(np.float32))
    buf = jnp.asarray(rng.standard_normal((b, w)).astype(np.float32))
    hist = jnp.asarray(rng.standard_normal((b, h)).astype(np.float32))

    f_dus = jax.jit(
        lambda buf, hist: (
            jax.lax.dynamic_update_slice(buf, hist, (0, 0)),
            jax.lax.dynamic_slice(buf, (0, w - h - tail), (b, h))),
        donate_argnums=(0,))
    f_cat = jax.jit(
        lambda x, hist: jnp.concatenate(
            [hist, x, jnp.zeros((b, tail), x.dtype)], axis=-1))

    bufc, histc = f_dus(buf, hist)
    float(jnp.sum(histc))
    out = f_cat(x, hist)
    float(jnp.sum(out[:, -1]))

    res = {"dus_ms": [], "concat_ms": []}
    for rep in range(3):
        start = time.perf_counter()
        for _ in range(32):
            bufc, histc = f_dus(bufc, histc)
        float(jnp.sum(histc))
        dt = time.perf_counter() - start
        s0 = time.perf_counter()
        float(jnp.sum(histc))
        fr = time.perf_counter() - s0
        res["dus_ms"].append(round((dt - fr) / 32 * 1e3, 3))

        start = time.perf_counter()
        hh = hist
        for _ in range(32):
            out = f_cat(x, hh)
            hh = out[:, :h]
        float(jnp.sum(out[:, -1]))
        dt = time.perf_counter() - start
        s0 = time.perf_counter()
        float(jnp.sum(out[:, -1]))
        fr = time.perf_counter() - s0
        res["concat_ms"].append(round((dt - fr) / 32 * 1e3, 3))
        print(json.dumps({"rep": rep, "dus_ms": res["dus_ms"][-1],
                          "concat_ms": res["concat_ms"][-1]}), flush=True)
    print(json.dumps(res), flush=True)


if __name__ == "__main__":
    main()
