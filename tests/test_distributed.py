"""Multi-process jax.distributed test (SURVEY §7 hard part 6; VERDICT r1
#10): 2 processes x 4 virtual CPU devices form one 8-device mesh running
the sharded SWE step; every process checks its shards against a local
whole-domain reference.

Opt-in (spawns subprocesses + a coordinator port): set NJW_DISTRIBUTED=1.
CI enables it in a dedicated step.
"""
import os
import socket
import subprocess
import sys

import pytest

pytestmark = pytest.mark.skipif(
    os.environ.get("NJW_DISTRIBUTED") != "1",
    reason="multi-process distributed test is opt-in (NJW_DISTRIBUTED=1)")

_WORKER = os.path.join(os.path.dirname(__file__), "distributed_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_sharded_swe():
    port = _free_port()
    coordinator = f"127.0.0.1:{port}"
    env = {k: v for k, v in os.environ.items()
           if k not in ("PYTHONPATH", "JAX_PLATFORMS", "XLA_FLAGS")}
    procs = [
        subprocess.Popen(
            [sys.executable, _WORKER, coordinator, "2", str(i)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
            text=True)
        for i in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=600)
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out}"
        assert f"DISTRIBUTED_OK proc={i}" in out
