"""2-process jax.distributed multi-host simulation (VERDICT r2 item 8).

The reference's multi-machine story is d2 ``launch(num_machines,
machine_rank, dist_url)`` -> torch.distributed over NCCL
(/root/reference/train_det.py:80-87). The TPU-native counterpart is
``jax.distributed.initialize`` + a global mesh; this test runs it for
real across two OS processes (2 virtual CPU devices each, a (2, 2)
data x model mesh), exercising ``local_process_batch_slice`` with
process-local shards and a sharded orbax checkpoint round-trip.
Spawned as subprocesses (like the driver's dryrun_multichip) so the
parent pytest process's single-backend jax stays untouched.
"""

import os
import socket
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "_multihost_worker.py")


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_distributed_mesh_and_sharded_checkpoint(tmp_path):
    coord = f"127.0.0.1:{_free_port()}"
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # worker sets its own device count
    env["JAX_PLATFORMS"] = "cpu"
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, coord, "2", str(pid), str(tmp_path)],
            cwd=REPO,
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid} failed:\n{out}"
        assert f"MULTIHOST_OK {pid}" in out, out
