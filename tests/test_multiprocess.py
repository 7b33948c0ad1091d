"""True multi-process validation of ``setup(process_local=True)``.

Launches 2 OS processes × 4 virtual CPU devices each, joined into one
jax.distributed cluster on localhost, and runs tests/_mp_worker.py in both
batch regimes. Unlike the in-process 8-device mesh used elsewhere in the
suite, each worker here really cannot address the other's devices — the
global arrays assembled by ``_globalize`` are genuinely non-fully-
addressable, matching a TPU pod's topology (reference repo has no
multi-device code; SURVEY.md §2 "Parallelism inventory").
"""
import os
import socket
import subprocess
import sys

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(ROOT, "tests", "_mp_worker.py")
N_PROC = 2


def _free_port():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _run_workers(mode):
    port = _free_port()
    env = dict(os.environ)
    env.update({
        "JAX_PLATFORMS": "cpu",
        "XLA_FLAGS": "--xla_force_host_platform_device_count=4",
        "PYTHONPATH": ROOT,
    })
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, mode, str(pid), str(N_PROC), str(port)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True)
        for pid in range(N_PROC)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=600)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out}"
        assert f"WORKER_OK {mode} {pid}" in out, out


def test_two_process_shared_batch():
    _run_workers("shared")


def test_two_process_hetero_batch():
    _run_workers("hetero")
