"""Multi-host (2-process) jax.distributed proof on the virtual CPU mesh.

SURVEY §2.9: the reference scales across machines by shipping pickled Block
graphs to dask.distributed workers.  The TPU-native equivalent is SPMD —
every host runs the same program under ``jax.distributed`` and the global
mesh spans all hosts.  This test launches TWO separate OS processes, each
seeing 4 virtual CPU devices, joins them into one 8-device cluster, runs
the flagship sharded tile pipeline (halo exchange included, so the sp
collectives really cross the process boundary) and bit-compares against
the single-process numpy ground truth inside each worker
(tests/mh_worker.py).
"""
import os
import socket
import subprocess
import sys

import pytest

HERE = os.path.dirname(os.path.abspath(__file__))
WORKER = os.path.join(HERE, "mh_worker.py")


def _free_port():
    with socket.socket() as sock:
        sock.bind(("localhost", 0))
        return sock.getsockname()[1]


def _worker_env():
    env = dict(os.environ)
    env["PALLAS_AXON_POOL_IPS"] = ""
    env["JAX_PLATFORMS"] = "cpu"
    # each process gets its own 4-device CPU platform (8 global)
    flags = [
        f
        for f in env.get("XLA_FLAGS", "").split()
        if not f.startswith("--xla_force_host_platform_device_count")
    ]
    flags.append("--xla_force_host_platform_device_count=4")
    env["XLA_FLAGS"] = " ".join(flags)
    env.pop("_GRAFT_DRYRUN_CHILD", None)
    return env


def test_two_process_sharded_pipeline_bitmatches():
    port = _free_port()
    env = _worker_env()
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(process_id), str(port)],
            env=env,
            cwd=HERE,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
        )
        for process_id in (0, 1)
    ]
    outputs = []
    try:
        for proc in procs:
            out, _ = proc.communicate(timeout=300)
            outputs.append(out)
    except subprocess.TimeoutExpired:
        for proc in procs:
            proc.kill()
        pytest.fail("multi-host workers timed out:\n" + "\n".join(outputs))
    for process_id, (proc, out) in enumerate(zip(procs, outputs)):
        assert proc.returncode == 0, "worker %d failed:\n%s" % (process_id, out)
        assert "MULTIHOST-OK process=%d" % process_id in out, out
        # the public get_data path crossed processes and answered whole
        assert "MULTIHOST-API-OK process=%d" % process_id in out, out
