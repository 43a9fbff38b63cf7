"""Real multi-process process-group test: two OS processes join via
core.distributed.initialize (gRPC coordinator + Gloo CPU collectives) and
run the corpus-sharded top-k collective across the process boundary.

This is the honest stand-in for a multi-host TPU pod: same initialize()
path, same global-mesh construction, same shard_map collectives — only the
transport differs (Gloo instead of ICI/DCN)."""
import os
import socket
import subprocess
import sys

import pytest


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_group_sharded_topk():
    worker = os.path.join(os.path.dirname(__file__), "_dist_worker.py")
    port = _free_port()
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    # each process gets exactly one CPU device (the parent test env forces 8)
    env.pop("XLA_FLAGS", None)
    env.pop("JAX_NUM_PROCESSES", None)
    env.pop("JAX_COORDINATOR_ADDRESS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(pid), str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=220)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("distributed worker timed out")
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid} failed:\n{out}"
        assert f"DIST_OK proc={pid}" in out, out
