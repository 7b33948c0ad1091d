"""True multi-process validation of ``setup(process_local=True)``.

Launches 2 OS processes × 4 virtual CPU devices each, joined into one
jax.distributed cluster on localhost, and runs tests/_mp_worker.py in both
batch regimes. Unlike the in-process 8-device mesh used elsewhere in the
suite, each worker here really cannot address the other's devices — the
global arrays assembled by ``_globalize`` are genuinely non-fully-
addressable, matching a TPU pod's topology (reference repo has no
multi-device code; SURVEY.md §2 "Parallelism inventory").

Covered end-to-end per worker: setup → solve → fp64-oracle parity on the
local rows, objective() with Ruiz scaling, update(g), update_matrices(H),
and (checkpoint variant) shard-file save → same-layout restore → re-solve.
The parent test then merges the per-process shard files into ONE
single-process solver and oracle-checks the full batch.
"""
import os
import socket
import subprocess
import sys

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(ROOT, "tests", "_mp_worker.py")
N_PROC = 2


def _free_port():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _run_workers(mode, ckpt=None):
    port = _free_port()
    env = dict(os.environ)
    env.update({
        "JAX_PLATFORMS": "cpu",
        "XLA_FLAGS": "--xla_force_host_platform_device_count=4",
        "PYTHONPATH": ROOT,
    })
    argv_tail = [] if ckpt is None else [ckpt]
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, mode, str(pid), str(N_PROC),
             str(port)] + argv_tail,
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
        if mode == "shared":
            assert f"SHARDMAP_OK {mode} {pid}" in out, out
        if ckpt is not None:
            assert f"CKPT_OK {mode} {pid}" in out, out


def test_two_process_shared_batch():
    _run_workers("shared")


def test_two_process_hetero_batch(tmp_path):
    # One launch covers hetero multi-host end-to-end AND the shard-file
    # checkpoint round-trip on the same cluster.
    _run_workers("hetero", ckpt=str(tmp_path / "ckpt"))
    _merged_restore_check("hetero", str(tmp_path / "ckpt"))


def test_two_process_shared_checkpoint(tmp_path):
    _run_workers("shared", ckpt=str(tmp_path / "ckpt"))
    _merged_restore_check("shared", str(tmp_path / "ckpt"))


def _merged_restore_check(mode, ckpt):
    """Single-process restore of the pod-written shard files: the merged
    solver holds the full global batch and solves to oracle accuracy."""
    import _mp_worker as W

    from reluqp_tpu.utils.checkpoint import load_batched_solver
    from reluqp_tpu.utils.problems import solve_qp_oracle

    m = load_batched_solver(ckpt)
    assert m.B_n == W.B_LOCAL * N_PROC
    if mode == "hetero":
        # per-problem caps must reassemble to the GLOBAL batch, not stay
        # shard 0's local rows (alpha != 1 restores broadcast from them)
        assert np.shape(m.rho_cap) == (m.B_n,), np.shape(m.rho_cap)
    res = m.solve()   # warm from the checkpointed state
    assert np.asarray(res.info.status).all()
    x = np.asarray(res.x)
    for pid in range(N_PROC):
        H2, G2, As, L, U = W.build_problems(mode, pid, updated=True)
        for i in range(W.B_LOCAL):
            Hp = H2 if mode == "shared" else H2[i]
            Ap = As if mode == "shared" else As[i]
            x_star = solve_qp_oracle(Hp, G2[i], Ap, L[i], U[i])
            row = pid * W.B_LOCAL + i
            err = float(np.max(np.abs(x[row] - x_star)))
            assert err < 2e-4, (mode, row, err)
