"""Multi-host (2-process) data parallelism on the fake CPU backend.

SURVEY.md §2.2: the distributed comm layer is jax.distributed + XLA
collectives.  This spawns two REAL processes, each owning 2 fake CPU
devices, builds the 4-device global mesh, assembles global batches from
process-local shards and verifies a jitted loss/grad over the global
array against the full-batch numpy computation (see
_distributed_worker.py).
"""

import os
import socket
import subprocess
import sys


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_global_batch_and_grad():
    port = _free_port()
    coord = f"127.0.0.1:{port}"
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    worker = os.path.join(root, "tests", "_distributed_worker.py")
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS", "PYTHONPATH")}
    env["PYTHONPATH"] = root
    procs = [subprocess.Popen(
        [sys.executable, worker, coord, "2", str(pid)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        env=env) for pid in range(2)]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=540)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out}"
        assert f"DISTRIBUTED_WORKER_OK pid={pid}" in out, out
    # both processes computed the identical global loss
    l0 = outs[0].split("loss=")[1].split()[0]
    l1 = outs[1].split("loss=")[1].split()[0]
    assert l0 == l1, (l0, l1)
