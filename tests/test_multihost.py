"""Multi-host runtime smoke test: REAL jax.distributed with two local
processes (Gloo coordination), exercising parallel/multihost.py —
pod_mesh layout, host-sharded data assembly, and a cross-process sharded
IIR run.  This is the closest a single machine gets to the N>=2-host
north-star config (SURVEY.md §4 "porting the methodology")."""

import subprocess
import sys
import textwrap


WORKER = textwrap.dedent("""
    import sys
    sys.path.insert(0, {repo!r})
    import jax
    jax.config.update('jax_platforms', 'cpu')
    jax.config.update('jax_num_cpu_devices', 2)
    pid = int(sys.argv[1])
    _results = open(sys.argv[2], "a")
    def report(line):
        print(line, flush=True)
        _results.write(line + chr(10))
        _results.flush()
    from simpledsp_tpu.parallel import multihost
    multihost.initialize(coordinator="localhost:{port}",
                         num_processes=2, process_id=pid)
    import numpy as np, jax.numpy as jnp
    assert jax.process_count() == 2
    mesh = multihost.pod_mesh()
    assert dict(mesh.shape) == {{'dp': 2, 'sp': 2}}
    rng = np.random.default_rng(pid)
    local = rng.standard_normal((1, 1024)).astype(np.float32)
    x = multihost.host_sharded(mesh, local)
    assert x.shape == (2, 1024)
    from simpledsp_tpu.models.northstar import default_design
    from simpledsp_tpu.parallel import ShardedBlockIIR
    f = ShardedBlockIIR(default_design(), mesh, block_size=64)
    y, st = f(x)
    val = float(jnp.sum(jnp.abs(y)))
    report(f"OK proc {{pid}} checksum {{val:.6f}}")

    # Halo-exchange FIR across the process boundary (ppermute ring).
    from simpledsp_tpu.design.fir import lowpass_taps
    from simpledsp_tpu.parallel import ShardedFIR
    fir = ShardedFIR(lowpass_taps(33, 0.25, fs=1.0), mesh)
    yf, _ = fir(x)
    val_fir = float(jnp.sum(jnp.abs(yf)))
    report(f"OKFIR proc {{pid}} checksum {{val_fir:.6f}}")

    # Full sharded north-star chain across processes, validated against a
    # locally-computed SERIAL reference on the (deterministic) global input.
    from simpledsp_tpu.models.northstar import NorthStarChain, ShardedNorthStarChain
    chain = ShardedNorthStarChain(mesh, fft_size=256, block_size=64,
                                  dtype=jnp.float32, use_pallas=False)
    (sr, si), _ = chain(x)
    val_chain = float(jnp.sum(jnp.abs(sr)) + jnp.sum(jnp.abs(si)))
    ref_in = np.concatenate(
        [np.random.default_rng(p).standard_normal((1, 1024)).astype(np.float32)
         for p in range(2)], axis=0)
    serial = NorthStarChain(fft_size=256, block_size=64,
                            dtype=jnp.float32, use_pallas=False)
    (rr, ri), _ = serial(jnp.asarray(ref_in))
    val_serial = float(jnp.sum(jnp.abs(rr)) + jnp.sum(jnp.abs(ri)))
    rel = abs(val_chain - val_serial) / max(abs(val_serial), 1e-9)
    assert rel < 1e-5, (val_chain, val_serial)
    report(f"OKCHAIN proc {{pid}} checksum {{val_chain:.6f}}")

    # Round-4 sharded ops across the process boundary: centered
    # convolution (left halo + centering ppermute) and STFT (right-
    # neighbor look-ahead halo), both vs in-worker serial references.
    from simpledsp_tpu.ops.conv import convolve
    from simpledsp_tpu.parallel import ShardedConvolve, ShardedSTFT
    h33 = lowpass_taps(33, 0.2, fs=1.0)
    yc = ShardedConvolve(h33, mesh, dtype=jnp.float32)(x)
    ref_c = convolve(jnp.asarray(ref_in), h33, mode="same")
    rel_c = float(jnp.max(jnp.abs(yc - ref_c))
                  / jnp.max(jnp.abs(ref_c)))
    assert rel_c < 1e-5, rel_c
    report(f"OKCONV proc {{pid}} checksum "
           f"{{float(jnp.sum(jnp.abs(yc))):.6f}}")

    from simpledsp_tpu.ops.spectral import stft_ri
    st = ShardedSTFT(mesh, nfft=128, hop=64, dtype=jnp.float32)
    gr, gi = st(x)
    rr_s, ri_s = stft_ri(jnp.asarray(ref_in).astype(jnp.float32), 128,
                         hop=64)
    rel_s = float(jnp.max(jnp.abs(gr - rr_s)) + jnp.max(jnp.abs(gi - ri_s)))
    assert rel_s < 1e-4, rel_s
    report(f"OKSTFT proc {{pid}} checksum "
           f"{{float(jnp.sum(jnp.abs(gr))):.6f}}")
""")


def test_two_process_distributed(tmp_path):
    import pathlib
    repo = str(pathlib.Path(__file__).parent.parent)
    script = tmp_path / "worker.py"
    script.write_text(WORKER.format(repo=repo, port=9967))
    res_files = [tmp_path / f"results_{i}.txt" for i in range(2)]
    procs = [subprocess.Popen([sys.executable, str(script), str(i),
                               str(res_files[i])],
                              stdout=subprocess.PIPE,
                              stderr=subprocess.STDOUT, text=True)
             for i in range(2)]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=220)
        outs.append(out)
        assert p.returncode == 0, out[-2000:]
    # both processes computed the SAME global result for every mechanism
    # exercised: sharded IIR (state collective), halo FIR (ppermute ring),
    # and the full sharded chain (+ serial-reference parity in-worker).
    # Checks are read from per-process RESULT FILES, not stdout:
    # stderr is merged into stdout and absl/jax warnings can interleave
    # mid-line under host load (observed once in a full-suite run,
    # corrupting a checksum token).
    results = [f.read_text().splitlines() for f in res_files]
    for tag in ("OK ", "OKFIR ", "OKCHAIN ", "OKCONV ", "OKSTFT "):
        checks = [ln for o in results for ln in o
                  if ln.startswith(tag)]
        assert len(checks) == 2, (tag, outs)
        # Toleranced, not string-exact: the checksum is a float reduction
        # whose summation order can jitter in the last printed digit when
        # the host is loaded (observed once in a full-suite run); a broken
        # collective/halo produces relative errors orders of magnitude
        # larger than 1e-6.
        a, b = (float(c.split()[-1]) for c in checks)
        scale = max(abs(a), abs(b), 1e-30)
        assert abs(a - b) / scale < 1e-6, checks
