"""End-to-end streaming benchmark: file -> native SPSC ring -> native IQ
converter -> TPU FM receiver bank (zero-copy padded entry, donated
buffers) -> native audio sink, with host I/O pipelined one chunk deep
against device compute.

This measures the FULL production path — including the host<->device
transfers the compute-only benches (bench.py, tools/bench_banks) keep
resident — and attributes wall time per stage so the "can the host keep
the chip fed" question gets a number instead of an assumption
(reference anchor: SURVEY.md §2a native-code ledger).

Prints ONE JSON line:
  {"metric": "stream_e2e_fm_bank", "value": N, "unit": "Msamples/s", ...}

Run on the real chip:  python bench_stream.py
"""

import json
import os
import tempfile
import time

import numpy as np

B, T, CHUNKS = 16, 1 << 19, 8   # 16 streams x 512k complex samples/chunk


def main():
    import jax  # noqa: F401
    import jax.numpy as jnp
    from simpledsp_tpu.models.sdr import FMReceiverBank
    from simpledsp_tpu.runtime.stream import (FileSink, FileSource,
                                              RingBuffer, f32_to_i16,
                                              iq16_to_planes)

    rng = np.random.default_rng(0)
    nbytes_chunk = B * T * 2 * 2            # interleaved int16 IQ
    tmp = tempfile.mkdtemp(prefix="sdsp_stream_")
    in_path = os.path.join(tmp, "iq16.bin")
    out_path = os.path.join(tmp, "audio_i16.bin")
    with open(in_path, "wb") as f:
        for _ in range(CHUNKS + 1):         # +1 warm-up chunk
            f.write(rng.integers(-2048, 2048, B * T * 2,
                                 dtype=np.int16).tobytes())

    bank = FMReceiverBank(16, fs=1.6e6, use_pallas=True)
    front, total = bank.padded_spec(T)
    state = bank.init_state(B)
    # TWO alternating host staging pairs: jnp.asarray's host->device
    # transfer may still be reading pair i when the loop prepares the
    # next chunk, so chunk i+1 stages into the OTHER pair; by the time a
    # pair is reused (chunk i+2), chunk i's audio has been fetched —
    # which orders after its upload was consumed.
    bufs = [(np.zeros((B, total), np.float32),
             np.zeros((B, total), np.float32)) for _ in range(2)]

    ring_in = RingBuffer(1 << 26)
    ring_out = RingBuffer(1 << 24)
    src = FileSource(in_path, ring_in, chunk=1 << 20)
    sink = FileSink(out_path, ring_out, chunk=1 << 20)

    stage_s = {"pop": 0.0, "convert": 0.0, "stage": 0.0, "submit": 0.0,
               "fetch": 0.0, "sink": 0.0}

    def one_chunk(state, pending, idx, record=True):
        br, bi = bufs[idx & 1]
        t0 = time.perf_counter()
        raw = ring_in.pop_exact(nbytes_chunk, dtype=np.int16)
        t1 = time.perf_counter()
        re, im = iq16_to_planes(raw)        # native, multithreaded
        t2 = time.perf_counter()
        br[:, front:front + T] = re.reshape(B, T)
        bi[:, front:front + T] = im.reshape(B, T)
        t3 = time.perf_counter()
        planes = (jnp.asarray(br), jnp.asarray(bi))
        audio, state, _ = bank.process_padded(planes, state)
        t4 = time.perf_counter()
        if pending is not None:
            a_host = np.asarray(pending)    # sync on the PREVIOUS chunk
            t5 = time.perf_counter()
            ring_out.push(f32_to_i16(a_host.ravel(), scale=8192.0)
                          .view(np.uint8))
            t6 = time.perf_counter()
        else:
            t5 = t6 = t4
        if record:
            stage_s["pop"] += t1 - t0
            stage_s["convert"] += t2 - t1
            stage_s["stage"] += t3 - t2
            stage_s["submit"] += t4 - t3
            stage_s["fetch"] += t5 - t4
            stage_s["sink"] += t6 - t5
        return state, audio

    # Warm-up chunk: compiles the padded-entry program, fills the pipe.
    state, pending = one_chunk(state, None, 0, record=False)
    _ = np.asarray(pending)                 # force compile+execute now
    pending = None

    start = time.perf_counter()
    for i in range(CHUNKS):
        state, pending = one_chunk(state, pending, i + 1)
    a_host = np.asarray(pending)            # drain the pipeline
    ring_out.push(f32_to_i16(a_host.ravel(), scale=8192.0).view(np.uint8))
    wall = time.perf_counter() - start

    src.stop()
    written = sink.stop()
    ring_in.close()
    ring_out.close()
    for p in (in_path, out_path):
        os.unlink(p)
    os.rmdir(tmp)

    n_samples = B * T * CHUNKS
    msps = n_samples / wall / 1e6
    # Device-only reference at this chunk shape (chained, value-fetch
    # sync, one loop — the bench_banks protocol on the same program).
    s2 = bank.init_state(B)
    p2 = (jnp.asarray(bufs[0][0]), jnp.asarray(bufs[0][1]))
    a2, s2, p2 = bank.process_padded(p2, s2)
    float(np.asarray(s2.demod.prev_r.ravel()[0]))
    t0 = time.perf_counter()
    for _ in range(CHUNKS):
        a2, s2, p2 = bank.process_padded(p2, s2)
    float(np.asarray(s2.demod.prev_r.ravel()[0]))
    dev_dt = time.perf_counter() - t0
    dev_msps = n_samples / dev_dt / 1e6

    # CHUNKS pushes total: the warm-up chunk's audio is dropped, the
    # steady loop pushes CHUNKS - 1 predecessors, the drain pushes the
    # last.  Per-chunk audio = B * T / decim samples.
    audio_expect = (B * T // bank.decim) * CHUNKS
    # Host-CPU-only rate (pop + convert + stage + sink — the work a
    # production host does per chunk) and the implied tunnel transfer
    # bandwidth (the "fetch" stage is the sync point where the per-chunk
    # upload (2 planes) + audio download drain through the tunnel).
    host_cpu_s = (stage_s["pop"] + stage_s["convert"] + stage_s["stage"]
                  + stage_s["sink"])
    xfer_bytes = CHUNKS * (2 * bufs[0][0].nbytes
                           + B * T // bank.decim * 4)
    result = {
        "metric": "stream_e2e_fm_bank",
        "value": round(msps, 1),
        "unit": "Msamples/s",
        "vs_baseline": None,
        "detail": {
            "streams": B, "samples_per_chunk": T, "chunks": CHUNKS,
            "wall_s": round(wall, 3),
            "stage_seconds": {k: round(v, 3) for k, v in stage_s.items()},
            "device_only_Msps": round(dev_msps, 1),
            "host_cpu_only_Msps": round(n_samples / host_cpu_s / 1e6, 1)
            if host_cpu_s > 0 else None,
            "tunnel_MBps": round(xfer_bytes / 1e6
                                 / max(stage_s["fetch"], 1e-9), 1),
            "bottleneck": ("tunnel_transfers"
                           if stage_s["fetch"] > 0.5 * wall else
                           "host_cpu" if host_cpu_s > 0.5 * wall
                           else "device"),
            "audio_bytes_written": written,
            "audio_samples_expected": audio_expect,
        },
    }
    assert written == audio_expect * 2, (written, audio_expect * 2)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
