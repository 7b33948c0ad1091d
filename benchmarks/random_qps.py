"""Random-QP benchmark sweep (parity with the reference harness).

Reproduces the protocol of ``ReLU-QP-py/benchmarks/random_qps.py:14-108``:
nx over ``geomspace(nx_min, nx_max, n_sample)``, ``n_eq = n_ineq = nx/4``,
``n_seeds`` seeds each, warm-up solves for jit compile, solved-status and
solution-parity assertions per instance. Differences, by design:

- oracles: OSQP/ProxQP are optional (gated imports — not in the TPU image);
  the built-in gate is the fp64 scipy oracle from ``utils.problems`` plus
  the solver's own residual criteria;
- results are DUMPED AS JSON (the reference only saves a plot image,
  ``random_qps.py:97`` — no numbers are committed anywhere, BASELINE.md);
- an optional matplotlib plot reproduces the reference figure.

Run:  python benchmarks/random_qps.py [--nx-max 500] [--seeds 5]
          [--tol 1e-4] [--plot] [--oracle]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def _exclusion_record(nx: int, nc: int, args, reason: str) -> dict:
    """Size-exclusion record with the footprint numbers that bind it.

    For the fused whole-solve kernel the binding resource is VMEM:
    Mosaic's scoped stack holds ~5 W-sized temporaries around the
    in-kernel matmuls (measured 27.3 MB at Dp=1024 f32), so both the
    resident-bank and bank-streaming variants have hard Dp cutoffs
    (``ops.solve_kernel.full_solve_vmem_bytes``).
    """
    rec = dict(nx=int(nx), nc=int(nc), backend=args.backend, reason=reason)
    try:
        import numpy as _np
        from reluqp_tpu.ops.fused_step import LANE, pad_dim, round_up
        from reluqp_tpu.ops.solve_kernel import full_solve_vmem_bytes
        from reluqp_tpu.core.ladder import setup_rhos
        D = nx + 2 * nc
        dp = pad_dim(D)
        nxp = round_up(max(nx, LANE), LANE)
        ncp = round_up(max(nc, LANE), LANE)
        n_rho = len(setup_rhos(0.1, 1e-6, 1e6, True, 5.0))
        dt = _np.dtype(args.precision or "float32")
        kw = dict(iter_precision=args.iter_precision)
        rec.update(
            Dp=int(dp),
            vmem_resident_mb=round(float(full_solve_vmem_bytes(
                n_rho, dp, nxp, ncp, dt, **kw)) / 2**20, 1),
            vmem_stream_mb=round(float(full_solve_vmem_bytes(
                n_rho, dp, nxp, ncp, dt, stream_bank=True, **kw)) / 2**20,
                1),
            vmem_budget_mb=12, vmem_hardware_mb=16)
    except Exception:
        pass
    return rec


def reluqp_solve(H, g, A, l, u, tol, backend="auto",
                 iter_precision="highest", precision="float32",
                 max_iter=4000, scaling=False):
    from reluqp_tpu import ReLU_QP
    m = ReLU_QP()
    t0 = time.perf_counter()
    m.setup(H, g, A, l, u, eps_abs=tol, backend=backend,
            iter_precision=iter_precision, precision=precision,
            max_iter=max_iter, scaling=scaling)
    setup_t = time.perf_counter() - t0
    res = m.solve()
    return m, res, setup_t


def device_loop_us(m, reps: int = 20) -> float:
    """Honest per-solve latency via on-device K-solve scans.

    Axon-tunnel-safe (docs/perf_notes.md): fresh inputs per timed
    dispatch (the tunnel memoizes repeated identical executions), a
    scalar ``jax.device_get`` forces execution, and the per-dispatch
    overhead is cancelled by differencing a 2-solve and a
    ``2+reps``-solve scan.
    """
    import jax
    import jax.numpy as jnp
    from reluqp_tpu.core.iteration import solve_loop

    s = m.settings

    def mk(n):
        def k_solves(bank, qp_dev, y_zero):
            def body(carry, _):
                # carry-dependent start state keeps each rep a REAL solve
                # (a loop-invariant body would be hoisted out of the scan)
                res = solve_loop(
                    bank, qp_dev, y_zero + carry * 1e-30, 0, bank.rhos[0],
                    m._W_hi,
                    nx=m.nx, nc=m.nc, max_iter=s.max_iter,
                    check_interval=s.check_interval,
                    adaptive_rho=s.adaptive_rho,
                    adaptive_rho_tolerance=float(s.adaptive_rho_tolerance),
                    eps_abs=float(s.eps_abs), rho_min=float(s.rho_min),
                    rho_max=float(s.rho_max), chunk_runner=m._chunk_runner,
                    iter_precision=s.iter_precision, refine=bool(s.refine))
                # carry a result-dependent scalar so solves cannot be elided
                return carry + res.pri_res, ()
            c, _ = jax.lax.scan(body, jnp.asarray(0.0, y_zero.dtype), None,
                                length=n)
            return c
        return jax.jit(k_solves)

    y0 = jnp.zeros_like(m.y)
    noise_s = 2e-3   # axon tunnel dispatch jitter floor (~±1 ms)

    from reluqp_tpu.utils.timing import (entropy_rng, jit_chain_timer,
                                         two_point_step_time)
    rng = entropy_rng()   # never-repeating inputs: tunnel memoizes
    fresh = lambda j: rng.uniform(1e-7, 1e-6)
    timed = jit_chain_timer(
        mk, lambda eps: (m.bank, m.qp_dev, y0 + eps), fresh)
    d = two_point_step_time(timed, fresh, 2, 2 + reps,
                            noise_s=noise_s, jitter_s=noise_s)
    return d * 1e6


def native_check(H, g, A, l, u, tol):
    """One native C++ bank build serving both comparison roles.

    Returns ``(x_ref, t_solve)``: ``x_ref`` is the fp64 oracle solution
    at eps 1e-8 (the reference benchmark's independent-solver gate,
    ``ReLU-QP-py/benchmarks/random_qps.py:68``), ``t_solve`` the CPU
    solve time at the benchmark tolerance — the comparison column for
    the reference's headline log-log curve (``random_qps.py:83-97``
    plots ReLU-QP vs OSQP/ProxQP), solve phase only (setup excluded,
    matching ``osqp_solve``'s protocol). Either is None when
    unavailable/not converged. The O(N_rho·nx³) bank factorization is
    shared by both solves.
    """
    from reluqp_tpu import native
    from reluqp_tpu.core.bank import equality_mask
    from reluqp_tpu.core.ladder import setup_rhos
    if not native.available():
        return None, None
    eq = equality_mask(l, u, 1e-6)
    rhos = setup_rhos(0.1, 1e-6, 1e6, True, 5.0)
    W, _, b = native.build_bank(H, A, g, eq, rhos, 1e-6)
    y8, info8 = native.solve(H, A, g, l, u, W, b, rhos, max_iter=20000,
                             eps_abs=1e-8)
    x_ref = y8[:H.shape[0]] if info8.status == 1 else None
    t0 = time.perf_counter()
    y, info = native.solve(H, A, g, l, u, W, b, rhos, max_iter=4000,
                           eps_abs=tol)
    dt = time.perf_counter() - t0
    return x_ref, (dt if info.status == 1 else None)


def osqp_solve(H, g, A, l, u, tol):  # pragma: no cover - optional dep
    import osqp
    from scipy import sparse
    m = osqp.OSQP()
    m.setup(sparse.csc_matrix(H), g, sparse.csc_matrix(A), l, u,
            verbose=False, eps_abs=tol, eps_rel=0, max_iter=4000)
    t0 = time.perf_counter()
    r = m.solve()
    return r.x, time.perf_counter() - t0


def proxqp_solve(H, g, A, l, u, tol):  # pragma: no cover - optional dep
    from proxsuite import proxqp
    n, m_ = H.shape[0], A.shape[0]
    qp = proxqp.dense.QP(n, 0, m_)
    qp.settings.eps_abs = tol
    qp.init(H, g, None, None, A, l, u)
    t0 = time.perf_counter()
    qp.solve()
    return np.asarray(qp.results.x), time.perf_counter() - t0


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--sizes", type=int, nargs="+", default=None,
                   help="explicit nx list (overrides the geomspace; lets "
                        "a timed-out sweep resume at its missing sizes)")
    p.add_argument("--nx-min", type=int, default=10)
    p.add_argument("--nx-max", type=int, default=500)
    p.add_argument("--n-sample", type=int, default=10)
    p.add_argument("--seeds", type=int, default=5)
    p.add_argument("--tol", type=float, default=1e-4)
    p.add_argument("--backend", default="auto")
    p.add_argument("--iter-precision", default="highest")
    p.add_argument("--precision", default="float32",
                   help="storage/iteration dtype; float64 (needs jax x64, "
                        "CPU) reproduces the reference's fp64-default "
                        "strict-tolerance regime")
    p.add_argument("--max-iter", type=int, default=4000)
    p.add_argument("--scaling", action="store_true",
                   help="Ruiz equilibration. Required for fp32 at tol "
                        "<= 1e-4 beyond nx~300: the unscaled family's "
                        "||H|| and sigma_max(A) grow with nx past what a "
                        "float32 dual certificate can resolve "
                        "(docs/perf_notes.md, rho_cap section)")
    p.add_argument("--plot", action="store_true")
    p.add_argument("--device-loop", action="store_true",
                   help="also record per-solve latency from an on-device "
                        "K-solve scan (excludes host dispatch)")
    p.add_argument("--oracle", action="store_true",
                   help="check against the fp64 scipy oracle (slow)")
    p.add_argument("--no-native-oracle", action="store_true",
                   help="skip the native fp64 C++ oracle column")
    p.add_argument("--out", default="results/random_qp_benchmark.json")
    p.add_argument("--replot", metavar="JSON",
                   help="regenerate the plot from an existing results "
                        "file and exit (no solving)")
    args = p.parse_args(argv)

    if args.replot:
        with open(args.replot) as f:
            records = json.load(f)["records"]
        _plot(records, os.path.splitext(args.replot)[0] + ".png",
              any("osqp_s" in r for r in records))
        return

    import jax
    # The baked sitecustomize registers the axon TPU regardless of
    # JAX_PLATFORMS in the env; a live config update is what actually
    # switches platform (same dance as tests/conftest.py).
    plat = os.environ.get("RELUQP_BENCH_PLATFORM")
    if plat:
        jax.config.update("jax_platforms", plat)
    if args.precision in ("float64", "f64", "fp64", "double"):
        jax.config.update("jax_enable_x64", True)
    from reluqp_tpu.utils.problems import rand_qp, kkt_error

    try:
        import osqp  # noqa: F401
        have_osqp = True
    except ImportError:
        have_osqp = False
    try:
        import proxsuite  # noqa: F401
        have_proxqp = True
    except ImportError:
        have_proxqp = False

    nxs = (np.asarray(args.sizes, int) if args.sizes
           else np.unique(np.geomspace(args.nx_min, args.nx_max,
                                       args.n_sample).astype(int)))

    # Warm-up solves so jit compile is excluded (reference :53-55).
    inst = rand_qp(nx=nxs[0], n_eq=max(nxs[0] // 4, 1),
                   n_ineq=max(nxs[0] // 4, 1), seed=0, compute_sol=False)
    try:
        for _ in range(2):
            reluqp_solve(inst.H, inst.g, inst.A, inst.l, inst.u, args.tol,
                         args.backend, args.iter_precision, args.precision,
                         args.max_iter, args.scaling)
    except ValueError:
        pass   # first size excluded (backend boundary) — recorded below

    records = []
    if args.sizes and os.path.exists(args.out):
        # resume semantics: keep the finished sizes already flushed to
        # --out; only the sizes named in --sizes are (re)measured
        with open(args.out) as f:
            rerun = set(int(n) for n in nxs)
            records = [r for r in json.load(f)["records"]
                       if r["nx"] not in rerun]
        print(f"resuming: kept {len(records)} records from {args.out}")
    excluded = []
    for nx in nxs:
        n_eq = n_ineq = max(int(nx // 4), 1)
        for seed in range(args.seeds):
            inst = rand_qp(nx=nx, n_eq=n_eq, n_ineq=n_ineq, seed=seed,
                           compute_sol=False)
            try:
                m, res, setup_t = reluqp_solve(
                    inst.H, inst.g, inst.A, inst.l, inst.u, args.tol,
                    args.backend, args.iter_precision, args.precision,
                    args.max_iter, args.scaling)
            except ValueError as e:
                # Backend boundary (e.g. the fused whole-solve kernel's
                # VMEM cutoff): record the exclusion with the footprint
                # numbers instead of silently truncating the sweep.
                excluded.append(_exclusion_record(nx, n_eq + n_ineq,
                                                  args, str(e)))
                print(f"nx={nx:4d}  EXCLUDED: {e}")
                break
            assert res.info.status == "solved", \
                f"nx={nx} seed={seed}: {res.info.status}"
            # warm re-solve measures the steady-state path
            m.clear_primal_dual()
            t0 = time.perf_counter()
            res = m.solve()
            jax.block_until_ready(res.x)
            solve_t = time.perf_counter() - t0
            x = np.asarray(res.x, np.float64)
            rec = dict(nx=int(nx), n_eq=n_eq, n_ineq=n_ineq, seed=seed,
                       iters=res.info.iter, setup_s=setup_t,
                       solve_s=solve_t, pri_res=res.info.pri_res,
                       dua_res=res.info.dua_res)
            _, pri_feas, _ = kkt_error(inst.H, inst.g, inst.A, inst.l,
                                       inst.u, x)
            rec["primal_violation"] = float(pri_feas)
            if args.device_loop and seed == 0:
                rec["solve_device_us"] = device_loop_us(m)
            if args.oracle:
                # Independent scipy fp64 solve. Warm-started at OUR x —
                # the QP is strictly convex with a unique optimum, so the
                # start point cannot bias where trust-constr converges,
                # only how fast (cold trust-constr at nx=500 takes >10
                # min/instance; warm it is seconds).
                from reluqp_tpu.utils.problems import solve_qp_oracle
                x_sol = solve_qp_oracle(inst.H, inst.g, inst.A, inst.l,
                                        inst.u, x0=x, tol=1e-9)
                rec["err_vs_oracle"] = float(np.max(np.abs(x - x_sol)))
                assert rec["err_vs_oracle"] < 50 * args.tol, rec
            if not args.no_native_oracle:
                x_n, t_n = native_check(inst.H, inst.g, inst.A, inst.l,
                                        inst.u, args.tol)
                if x_n is not None:
                    rec["err_vs_native"] = float(np.max(np.abs(x - x_n)))
                    # the reference's acceptance gate (random_qps.py:68)
                    assert rec["err_vs_native"] < 50 * args.tol, rec
                if t_n is not None:
                    rec["native_s"] = t_n
            if have_osqp:
                x_o, t_o = osqp_solve(inst.H, inst.g, inst.A, inst.l,
                                      inst.u, args.tol)
                rec["osqp_s"] = t_o
                rec["err_vs_osqp"] = float(np.max(np.abs(x - x_o)))
            if have_proxqp:
                x_p, t_p = proxqp_solve(inst.H, inst.g, inst.A, inst.l,
                                        inst.u, args.tol)
                rec["proxqp_s"] = t_p
            records.append(rec)
        ms = [r["solve_s"] for r in records if r["nx"] == nx]
        if ms:
            print(f"nx={nx:4d}  solve {np.mean(ms)*1e3:8.2f} ± "
                  f"{np.std(ms)*1e3:6.2f} ms   "
                  f"iters {np.mean([r['iters'] for r in records if r['nx']==nx]):6.0f}")
        # incremental flush: a timeout can no longer lose finished sizes.
        # Atomic (tmp + rename): a mid-dump crash must not truncate a
        # previously committed artifact.
        os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
        with open(args.out + ".tmp", "w") as f:
            out = {"config": vars(args), "records": records}
            if excluded:
                out["excluded_sizes"] = excluded
            json.dump(out, f, indent=1)
        os.replace(args.out + ".tmp", args.out)

    print("wrote", args.out)

    if args.plot:
        _plot(records, os.path.splitext(args.out)[0] + ".png", have_osqp)


def _plot(records, path, have_osqp):  # pragma: no cover - visual artifact
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    nxs = sorted({r["nx"] for r in records})
    fig, ax = plt.subplots(figsize=(7, 4.5))

    def series(key):
        mean, std = [], []
        for nx in nxs:
            v = [r[key] for r in records if r["nx"] == nx and key in r]
            mean.append(np.mean(v) if v else np.nan)
            std.append(np.std(v) if v else np.nan)
        return np.array(mean), np.array(std)

    m, s = series("solve_s")
    ax.errorbar(nxs, m, yerr=s, label="ReLU-QP (TPU-native)", marker="o")
    m, s = series("native_s")
    if np.any(np.isfinite(m)):
        ax.errorbar(nxs, m, yerr=s, label="ReLU-QP (native C++, CPU)",
                    marker="^")
    if have_osqp:
        m, s = series("osqp_s")
        ax.errorbar(nxs, m, yerr=s, label="OSQP", marker="s")
    ax.set_xscale("log")
    ax.set_yscale("log")
    ax.set_xlabel("problem size nx")
    ax.set_ylabel("solve time (s)")
    ax.legend()
    ax.grid(True, which="both", alpha=0.3)
    fig.tight_layout()
    fig.savefig(path, dpi=150)
    print("wrote", path)


if __name__ == "__main__":
    main()
