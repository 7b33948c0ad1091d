"""LTV ensemble MPC: per-plant re-linearization via batched matrix updates.

An ensemble of B double-integrator plants whose control effectiveness
decays over time at different rates (think fuel burn: ``Bd_i(k) =
Bd / m_i(k)`` with per-plant mass schedules). The sparse MPC QP
(``gen_sparse_mpc_qp``) embeds the dynamics in the constraint matrix, so:

- every control step is a cheap ``update(l, u)`` (the x0 right-hand side
  of the first dynamics block) + warm ``solve`` over the whole ensemble;
- every few steps the linearization has drifted, and one
  ``update_matrices(A=...)`` call re-factorizes all B per-problem banks
  while the warm state and ladder positions carry over — the batched
  analogue of re-linearizing a time-varying model in flight. (The
  reference solver asserts matrix updates unsupported,
  ``ReLU-QP-py/reluqp/reluqpth.py:177``.)
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from reluqp_tpu.batch import BatchedReLU_QP
from reluqp_tpu.models.mpc import gen_sparse_mpc_qp

DT = 0.1
HORIZON = 8
NX, NU = 2, 1
AD = np.array([[1.0, DT], [0.0, 1.0]])
BD0 = np.array([[0.5 * DT * DT], [DT]])
U_MAX = 2.0


def plant_qp(mass):
    """Sparse MPC QP for one plant at its current mass (Bd = BD0/m)."""
    ns = HORIZON * (NU + NX)
    sel_u = np.zeros((HORIZON * NU, ns))
    for k in range(HORIZON):
        for j in range(NU):
            sel_u[k * NU + j, k * (NU + NX) + j] = 1.0
    box = np.full(HORIZON * NU, U_MAX)
    return gen_sparse_mpc_qp(AD, BD0 / mass, np.diag([10.0, 1.0]),
                             np.array([[0.1]]), np.diag([50.0, 5.0]),
                             HORIZON, A_add=sel_u, l_add=-box, u_add=box)


def x0_bounds(L, U, X):
    """Per-plant right-hand side of the first dynamics block."""
    rhs = -(X @ AD.T)                     # (B, nx): −Ad x0_i
    L[:, :NX] = rhs
    U[:, :NX] = rhs
    return L, U


def main(B=16, n_steps=40, relin_every=6):
    rng = np.random.RandomState(0)
    masses = 1.0 + 0.5 * rng.rand(B)          # initial masses
    decay = 0.97 + 0.02 * rng.rand(B)         # per-plant burn rates
    X = np.column_stack([2.0 + rng.randn(B), np.zeros(B)])

    Hs, As, Ls, Us = None, [], [], []
    for m_i in masses:
        H, _, A, l, u = plant_qp(m_i)
        Hs = H                                 # identical stage costs
        As.append(A)
        Ls.append(l)
        Us.append(u)
    As, Ls, Us = np.stack(As), np.stack(Ls), np.stack(Us)
    Ls, Us = x0_bounds(Ls, Us, X)

    model = BatchedReLU_QP()
    # A is batched -> heterogeneous regime (per-plant banks)
    model.setup(Hs, np.zeros((B, Hs.shape[0])), As, Ls, Us, eps_abs=1e-4)

    lin_masses = masses.copy()
    for k in range(n_steps):
        mass_k = masses * decay ** k
        if k and k % relin_every == 0:
            # linearization drifted: rebuild every bank, keep warm state
            As = np.stack([plant_qp(m_i)[2] for m_i in mass_k])
            model.update_matrices(A=As)
            lin_masses = mass_k.copy()
        Ls, Us = x0_bounds(Ls, Us, X)
        model.update(l=Ls, u=Us)
        res = model.solve()
        assert res.info.status.all(), res.info.status_strings()
        u0 = np.asarray(res.x, np.float64)[:, :NU]
        # true plants fly at the CURRENT mass (model lags until re-lin)
        X = X @ AD.T + (u0 / mass_k[:, None]) @ BD0.T
        if k % 10 == 0:
            drift = np.max(np.abs(mass_k / lin_masses - 1.0))
            print(f"k={k:3d}  max|x|={np.abs(X).max():7.4f}  "
                  f"mean iters={np.mean(res.info.iter):6.1f}  "
                  f"model-mass drift={drift:.3f}")
    print(f"final max|x| over {B} plants: {np.abs(X).max():.4f}")
    assert np.abs(X).max() < 0.2, "ensemble did not converge to origin"


if __name__ == "__main__":
    main()
