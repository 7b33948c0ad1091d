"""Measured decision for VERDICT #10: batched whole-solve kernel for
scenario MPC — land or retire?

At one QP size where the full bank fits VMEM (nx=64, nc=160 → D=384):
  (a) whole-solve kernel latency per solve (backend='fused'), measured
      as an on-device scan of carry-dependent solves, two-point fit;
  (b) chunked-GEMM batched path per-scenario device time at B=256.
A TPU Pallas grid runs cells sequentially on one core, so a
grid-over-scenarios whole-solve kernel costs ≈ B·(a) per batch, to be
compared against B·(b) = solve_device_ms.
"""
import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from reluqp_tpu import BatchedReLU_QP, ReLU_QP
from reluqp_tpu.solver import _fused_solve
from reluqp_tpu.utils.problems import rand_qp

nx, n_eq, n_ineq = 192, 48, 48   # D = 192 + 2*96 = 384, standard nx/4 shape
B = 256
inst = rand_qp(nx=nx, n_eq=n_eq, n_ineq=n_ineq, seed=0, compute_sol=False)

# ---------------------------------------------------------------- (a)
m = ReLU_QP()
m.setup(inst.H, inst.g, inst.A, inst.l, inst.u, backend="fused",
        eps_abs=1e-3)
r = m.solve()
assert r.info.status == "solved", r.info.status
s = m.settings
static = dict(nx=m.nx, nc=m.nc, nxp=m._nxp, ncp=m._ncp,
              max_iter=s.max_iter, check_interval=s.check_interval,
              adaptive_rho=s.adaptive_rho,
              adaptive_rho_tolerance=float(s.adaptive_rho_tolerance),
              eps_abs=float(s.eps_abs), rho_min=float(s.rho_min),
              rho_max=float(s.rho_max), rho_jump=bool(s.rho_jump))


def mk(n):
    def k_solves(y_zero):
        def body(carry, _):
            y, stats, obj = _fused_solve(
                m.bank.W, m.bank.b, m.bank.rhos, m._M_res, m._g_row,
                m.qp_dev.lo, m.qp_dev.hi, m.qp_dev.H, m.qp_dev.g,
                y_zero + carry * 1e-30, m.rho_ind, **static)
            return carry + stats[1], stats[0]
        c, iters = jax.lax.scan(body, jnp.asarray(0.0, y_zero.dtype),
                                None, length=n)
        return c, iters
    return jax.jit(k_solves)


REPS = 16
f_lo, f_hi = mk(2), mk(2 + REPS)
y0 = jnp.zeros_like(m.y)
float(jax.device_get(f_lo(y0)[0]))
c, iters = f_hi(y0)
float(jax.device_get(c))
iters_mean = float(np.mean(np.asarray(jax.device_get(iters))))
deltas = []
for i in range(5):
    t0 = time.perf_counter()
    float(jax.device_get(f_lo(y0 + (i + 1) * 1e-6)[0]))
    t_lo = time.perf_counter() - t0
    t0 = time.perf_counter()
    float(jax.device_get(f_hi(y0 + (i + 1) * 1e-6 + 3e-7)[0]))
    t_hi = time.perf_counter() - t0
    deltas.append(t_hi - t_lo)
med = sorted(deltas)[2]
assert med > 2e-3, f"delta inside tunnel jitter: {deltas}"
single_us = med / REPS * 1e6
print(f"(a) fused whole-solve: {single_us:9.1f} us/solve "
      f"(mean iters {iters_mean:.0f})")

# ---------------------------------------------------------------- (b)
from benchmarks.batched_qps import solve_device_ms  # noqa: E402

rng = np.random.default_rng(0)
G = np.tile(inst.g, (B, 1)) + 0.01 * rng.standard_normal((B, nx))
bm = BatchedReLU_QP()
bm.setup(inst.H, G, inst.A, np.tile(inst.l, (B, 1)),
         np.tile(inst.u, (B, 1)), eps_abs=1e-3, backend="pallas")
bm.solve()
ns = bm.info.status_strings()
assert all(x == "solved" for x in ns)
batch_ms = solve_device_ms(bm)
per_scn_us = batch_ms / B * 1e3
print(f"(b) batched chunked:   {batch_ms:9.2f} ms/batch = "
      f"{per_scn_us:7.2f} us/scenario (B={B})")

ratio = single_us / per_scn_us
print(f"grid-of-whole-solves would cost ~{ratio:.0f}x the batched GEMM "
      f"path per scenario")
out = dict(nx=nx, n_eq=n_eq, n_ineq=n_ineq, D=m.D, B=B,
           fused_single_us=single_us, fused_mean_iters=iters_mean,
           batched_ms_per_batch=batch_ms,
           batched_us_per_scenario=per_scn_us,
           grid_over_batched_ratio=ratio)
with open("/root/repo/results/wholesolve_decision_tpu.json", "w") as f:
    json.dump(out, f, indent=1)
print("wrote results/wholesolve_decision_tpu.json")
