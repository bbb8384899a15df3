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
    print(f"OK proc {{pid}} checksum {{val:.6f}}", flush=True)
""")


def test_two_process_distributed(tmp_path):
    import pathlib
    repo = str(pathlib.Path(__file__).parent.parent)
    script = tmp_path / "worker.py"
    script.write_text(WORKER.format(repo=repo, port=9967))
    procs = [subprocess.Popen([sys.executable, str(script), str(i)],
                              stdout=subprocess.PIPE,
                              stderr=subprocess.STDOUT, text=True)
             for i in range(2)]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=220)
        outs.append(out)
        assert p.returncode == 0, out[-2000:]
    checks = [l for o in outs for l in o.splitlines() if l.startswith("OK")]
    assert len(checks) == 2
    # both processes computed the SAME global result
    assert checks[0].split()[-1] == checks[1].split()[-1], checks
