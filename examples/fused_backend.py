"""Whole-solve kernel (`backend="fused"`): the entire ADMM solve — every
iteration window, the residual reductions, the ρ-ladder walk, and the
convergence exit — as ONE TPU kernel launch.

The bank lives fully in VMEM for small problems; for larger ones (up to
Dp ≈ 640 at fp32/18 rungs) it stays in HBM and the kernel streams the
CURRENT rung into a VMEM scratch on ρ-rung change, so a solve whose rung
holds does zero bank HBM traffic after the first check window. Measured
1.3–2.3× faster per iteration than the chunked path (docs/perf_notes.md,
`results/fused_auto_decision_tpu.json`); compile is slower, so it pays
off for setup-once / solve-many streams.

Since round 3 the kernel covers the FULL feature surface — this example
exercises over-relaxation, Ruiz scaling with unscaled termination,
bf16x3 + refine, runtime eps_abs updates, and infeasibility certificates,
all inside the one-launch solve. Requires a TPU device.
"""
import numpy as np

from reluqp_tpu import ReLU_QP
from reluqp_tpu.utils.problems import rand_qp

inst = rand_qp(nx=120, n_eq=30, n_ineq=30, seed=0, compute_sol=False)

# One-launch solve with over-relaxation + equilibration.
m = ReLU_QP()
m.setup(inst.H, inst.g, inst.A, inst.l, inst.u, backend="fused",
        alpha=1.6, scaling=True, eps_abs=1e-4)
r = m.solve()
print(f"fused alpha=1.6 + scaling: {r.info.status} in {r.info.iter} iters, "
      f"streamed bank: {m._stream_bank}")

# eps_abs is an SMEM runtime scalar in the kernel — tightening it does
# NOT recompile.
m.update_settings(eps_abs=3e-5)
r = m.solve()
print(f"tightened eps (no recompile): {r.info.status}, "
      f"dua {r.info.dua_res:.2e}")

# bf16x3 fast phase + HIGHEST polish, in-kernel two-phase refine.
m2 = ReLU_QP()
m2.setup(inst.H, inst.g, inst.A, inst.l, inst.u, backend="fused",
         iter_precision="high", refine=True, eps_abs=1e-4)
r2 = m2.solve()
print(f"bf16x3 + polish: {r2.info.status} in {r2.info.iter} iters")
assert np.max(np.abs(np.asarray(r2.x) - np.asarray(r.x))) < 1e-2

# Infeasibility certificates run inside the kernel too.
A = np.array([[1.0, 0.0], [1.0, 0.0], [0.0, 1.0]])
m3 = ReLU_QP()
m3.setup(np.eye(2), np.zeros(2), A,
         np.array([1.0, -np.inf, -1.0]), np.array([np.inf, -1.0, 1.0]),
         backend="fused", check_infeasibility=True)
print(f"contradictory bounds: {m3.solve().info.status}")
