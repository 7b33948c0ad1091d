"""Solver-state checkpoint/resume.

The reference's only state persistence is in-process warm starting
(SURVEY.md §5: "No serialization to disk anywhere"). This extension
serializes a set-up ``ReLU_QP`` — problem data, settings, the compiled
fp64-accurate weight bank in runtime layout, and the warm-start state — to
a single ``.npz`` so a deployment can resume (or migrate hosts) without
paying the setup-time factorization again: load cost is IO + H2D only.

``save_batched_solver``/``load_batched_solver`` do the same for
``BatchedReLU_QP`` — most valuable for heterogeneous batches, where the
per-problem banks are the expensive artifact (B × N_rho fp64
factorizations).
"""
from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from ..classes import SETTINGS_FIELDS

__all__ = ["save_solver", "load_solver",
           "save_batched_solver", "load_batched_solver"]

# Every Settings field except `device` (runtime placement, not state —
# and not JSON-serializable); new fields serialize automatically.
_SETTINGS_KEYS = [k for k in SETTINGS_FIELDS if k != "device"]


def _w_to_np(W):
    """bf16 banks round-trip through fp32 (.npz has no bfloat16)."""
    if W.dtype == jnp.bfloat16:
        return np.asarray(W.astype(jnp.float32))
    return np.asarray(W)


def save_solver(solver, path: str) -> None:
    """Serialize a set-up ``ReLU_QP`` (bank + state + settings) to .npz."""
    if not getattr(solver, "_ready", False):
        raise RuntimeError("solver not set up")
    stng = {k: getattr(solver.settings, k) for k in _SETTINGS_KEYS}
    stng["precision"] = str(np.dtype(solver.settings.precision_dtype))
    bank = jax.device_get(solver.bank)
    # Under a bf16-stored bank, persist the fp32 refine copy instead —
    # saving the quantized W would degrade the polish phase on reload.
    W_save = (jax.device_get(solver._W_hi)
              if getattr(solver, "_W_hi", None) is not None else bank.W)
    np.savez_compressed(
        path,
        settings=json.dumps(stng),
        H=solver.QP.H_np, g=solver.QP.g_np, A=solver.QP.A_np,
        l=solver.QP.l_np, u=solver.QP.u_np,
        # bank_B persists the fp64 host master when present (update(g)'s
        # host bias refresh stays setup-accurate across a reload).
        bank_W=_w_to_np(W_save),
        bank_B=(solver._B_np
                if getattr(solver, "_B_np", None) is not None
                else np.asarray(bank.B)),
        bank_b=np.asarray(bank.b), rhos=solver.rhos_np,
        y=np.asarray(jax.device_get(solver.y)),
        rho_ind=np.asarray(solver.rho_ind),
        Dp=np.asarray(solver.Dp),
        scal_D=solver.scal.D, scal_E=solver.scal.E,
        scal_c=np.asarray(solver.scal.c),
        # Resolved at setup (the bank was built with it); older files
        # without this field were built uncapped -> inf on load.
        rho_cap=np.asarray(solver.rho_cap),
    )


def load_solver(path: str, device=None):
    """Restore a ``ReLU_QP`` from ``save_solver`` output WITHOUT
    re-factorizing: the runtime-layout bank is device_put directly."""
    from ..classes import QP, Info, Results, Settings
    from ..core.bank import Bank, DeviceQP, equality_mask
    from ..core.iteration import xla_chunk_runner
    from ..ops.fused_step import pad_dim, pallas_chunk_runner, \
        vmem_bytes_needed
    from ..solver import _PALLAS_VMEM_BUDGET, ReLU_QP, _is_tpu
    from .scaling import Scaling

    t0 = time.perf_counter()
    data = np.load(path, allow_pickle=False)
    stng_kw = json.loads(str(data["settings"]))
    stng_kw["device"] = device

    solver = ReLU_QP.__new__(ReLU_QP)
    solver.info = Info()
    solver.results = Results(info=solver.info)
    solver.settings = Settings(**stng_kw)
    stng = solver.settings
    dtype = stng.precision_dtype

    solver.QP = QP(data["H"], data["g"], data["A"], data["l"], data["u"],
                   precision=dtype)
    solver.nx, solver.nc = solver.QP.nx, solver.QP.nc
    solver.D = solver.nx + 2 * solver.nc
    solver.Dp = int(data["Dp"])
    solver.rhos_np = np.asarray(data["rhos"], dtype=np.float64)
    solver.rho_ind = int(data["rho_ind"])
    solver._mesh, solver._tp_axis = None, "tp"
    solver.eq_mask = equality_mask(solver.QP.l_np, solver.QP.u_np,
                                   stng.eq_tol)
    D_s = np.asarray(data["scal_D"])
    E_s = np.asarray(data["scal_E"])
    c_s = float(data["scal_c"])
    solver.scal = Scaling(D=D_s, E=E_s, c=c_s, Dinv=1.0 / D_s,
                          Einv=1.0 / E_s, cinv=1.0 / c_s)
    solver._H_s = c_s * (solver.QP.H_np * D_s[:, None] * D_s[None, :])
    solver._A_s = solver.QP.A_np * E_s[:, None] * D_s[None, :]
    solver._g_s = c_s * D_s * solver.QP.g_np
    solver._l_s = E_s * solver.QP.l_np
    solver._u_s = E_s * solver.QP.u_np

    # The saved layout fixes Dp; pallas needs the lane-padded layout, a
    # TPU, AND a bank that fits VMEM (same gate as setup's _select_runner)
    # — otherwise the XLA runner handles either layout transparently.
    fits = vmem_bytes_needed(solver.Dp, 1, dtype,
                             stng.iter_precision) <= _PALLAS_VMEM_BUDGET
    if solver.Dp == pad_dim(solver.D) and _is_tpu(device) \
            and stng.backend != "xla" and fits:
        solver._chunk_runner = pallas_chunk_runner
    else:
        solver._chunk_runner = xla_chunk_runner
    # Restored solvers run the chunked path; the whole-solve-kernel
    # operands are rebuilt only by a fresh setup().
    solver._fused = False
    solver._M_res = solver._g_row = None
    solver._res_op_loop = False

    put = lambda a: jax.device_put(jnp.asarray(a, dtype=dtype), device)
    w_dtype = jnp.bfloat16 if stng.iter_precision == "bf16" else dtype
    solver.bank = Bank(W=jax.device_put(jnp.asarray(data["bank_W"],
                                                    dtype=w_dtype), device),
                       B=put(data["bank_B"]),
                       b=put(data["bank_b"]), rhos=put(data["rhos"]))
    # Host master for update(g)'s fp64 bias refresh (fp64 in checkpoints
    # written after it was introduced; older files carry the cast copy,
    # which is still far more accurate than a device-GEMV refresh).
    solver._B_np = np.asarray(data["bank_B"], np.float64)
    # fp32 bank copy for the refine phase under a bf16-stored bank (the
    # file always holds the fp32 layout).
    solver._W_hi = put(data["bank_W"]) \
        if stng.iter_precision == "bf16" and stng.refine else None
    lo, hi = solver._padded_bounds(solver._l_s, solver._u_s, dtype)
    # Residual unscale weights are derived state (scal + settings), not
    # serialized — THE shared derivation (scaling.residual_unscale_weights)
    # guarantees restored solvers terminate against the same units.
    from .scaling import residual_unscale_weights
    wp, wd = residual_unscale_weights(solver.scal, stng)
    solver.qp_dev = DeviceQP(
        H=put(solver._H_s), g=put(solver._g_s),
        A=put(solver._A_s), lo=put(lo), hi=put(hi),
        w_pri=None if wp is None else put(wp),
        w_dua=None if wd is None else put(wd))
    solver._w_pri_np, solver._w_dua_np = wp, wd
    # One-matmul residual operator for the loop's check (derived state,
    # same gate as setup: TPU + alpha=1; see solver.py).
    if stng.alpha == 1.0 and _is_tpu(device):
        from ..ops.solve_kernel import build_residual_operator
        M_res, g_row, nxp, ncp = build_residual_operator(
            solver._H_s, solver._A_s, solver._g_s, solver.Dp, dtype,
            w_pri=wp, w_dua=wd)
        solver._M_res = jax.device_put(M_res, device)
        solver._g_row = jax.device_put(g_row, device)
        solver._nxp, solver._ncp = nxp, ncp
        solver._res_op_loop = True
    solver._unscale_x = put(solver.scal.D)
    solver._unscale_z = put(solver.scal.Einv)
    solver._unscale_lam = put(solver.scal.E * solver.scal.cinv)
    from ..core.bank import effective_rho_ladder
    solver.rho_cap = float(data["rho_cap"]) if "rho_cap" in data \
        else float("inf")
    solver._sigma_max_sq = None   # lazy (update_settings eps-floor guard)
    solver._rho_eff_np = effective_rho_ladder(solver.rhos_np,
                                              solver.eq_mask,
                                              solver.rho_cap)
    solver._rho_eff = put(solver._rho_eff_np) \
        if stng.alpha != 1.0 else None
    solver.y = put(data["y"])
    jax.block_until_ready((solver.bank, solver.qp_dev, solver.y))
    solver.info.setup_time = time.perf_counter() - t0
    solver.info.update_time = 0.0
    solver._ready = True
    return solver


# --------------------------------------------------------------------- #
# batched solver                                                        #
# --------------------------------------------------------------------- #

def _shard_path(path: str, pid: int, n: int) -> str:
    """Per-process file name of a multi-host checkpoint: the caller's path
    is the common prefix, each host writes ``<prefix>.proc<k>of<n>.npz``."""
    base = path[:-4] if path.endswith(".npz") else path
    return f"{base}.proc{pid}of{n}.npz"


def _local_axis(arr, axis: int) -> np.ndarray:
    """Host copy of this process's shard of ``arr`` along ``axis``
    (delegates to the one shard-gather recipe, ``parallel.local_axis``)."""
    from ..parallel import local_axis
    return local_axis(arr, axis)


def _get_repl(a) -> np.ndarray:
    """Host copy of a replicated array (``parallel.host_replicated``)."""
    from ..parallel import host_replicated
    return host_replicated(a)


def save_batched_solver(m, path: str) -> None:
    """Serialize a set-up ``BatchedReLU_QP`` (banks + state) to .npz.

    The mesh (if any) is runtime placement, not state — pass one to
    ``load_batched_solver`` to re-shard on load.

    Multi-host (``process_local``) solvers checkpoint by shard: every
    process writes ``<path>.proc<k>of<n>.npz`` holding ITS rows of the
    global batch (call on all processes with the same path, e.g. a shared
    filesystem). ``load_batched_solver`` restores either on the same
    process layout or single-process (reassembling every shard).
    """
    if not getattr(m, "_ready", False):
        raise RuntimeError("solver not set up")
    multi = bool(getattr(m, "_multi", False))
    stng = {k: getattr(m.settings, k) for k in _SETTINGS_KEYS}
    stng["precision"] = str(np.dtype(m.settings.precision_dtype))
    if multi:
        pc = jax.process_count()
        path = _shard_path(path, jax.process_index(), pc)
        # Batch-led arrays: this process's rows; replicated arrays: the
        # local copy. The shard file records local sizes; the global
        # batch size is pc × B_local (equal shards by construction).
        get = _get_repl
        rows = lambda a: m._local_rows(a)
        B_save, Bp_save = m.B_local, m.B_local
        bias = (rows(m.bias_all) if m.hetero
                else _local_axis(m.bias_all, 1))
        rho_ind = (np.asarray(int(jax.device_get(m.rho_ind)))
                   if m.rho_mode == "shared" else rows(m.rho_ind))
        hetero_led = rows if m.hetero else get
    else:
        get = lambda a: np.asarray(jax.device_get(a))
        rows = get
        B_save, Bp_save = m.B_n, m.B_pad
        bias = get(m.bias_all)
        rho_ind = get(m.rho_ind)
        hetero_led = get
    eq = (np.zeros((0,), np.bool_) if m._eq_pattern is None
          else np.asarray(m._eq_pattern, np.bool_))
    np.savez_compressed(
        path,
        settings=json.dumps(stng),
        n_procs=np.asarray(jax.process_count() if multi else 1),
        proc_id=np.asarray(jax.process_index() if multi else 0),
        hetero=np.asarray(m.hetero), rho_mode=np.asarray(m.rho_mode),
        B_n=np.asarray(B_save), B_pad=np.asarray(Bp_save),
        nx=np.asarray(m.nx), nc=np.asarray(m.nc), Dp=np.asarray(m.Dp),
        Wt_bank=_w_to_np(hetero_led(m._Wt_hi)
                         if getattr(m, "_Wt_hi", None) is not None
                         else hetero_led(m.Wt_bank)),
        B_bank=hetero_led(m.B_bank),
        H=hetero_led(m.H_dev), A=hetero_led(m.A_dev), G=rows(m.G),
        lo=rows(m.lo), hi=rows(m.hi), Y=rows(m.Y),
        rho_ind=rho_ind, rhos=m.rhos_np,
        unx=hetero_led(m._unx), unz=hetero_led(m._unz),
        unlam=hetero_led(m._unlam),
        scal_D=np.asarray(m.scal.D), scal_E=np.asarray(m.scal.E),
        scal_c=np.asarray(m.scal.c),
        rho_cap=np.asarray(m.rho_cap),
        eq_pattern=eq, l_np=m._l_np, u_np=m._u_np,
        # Setup-accurate bias + hi/lo cast residuals (fp64 bias fidelity
        # survives the round trip; see batch._bias_split).
        bias_all=bias,
        G_lo=(rows(m._G_lo) if m._G_lo is not None
              else np.zeros((0,), np.float32)),
        B_lo=(hetero_led(m._B_lo)
              if getattr(m, "_B_lo", None) is not None
              else np.zeros((0,), np.float32)),
        # fp64 pre-promotion masters + setup modes, so update_matrices()
        # works on a restored solver without precision loss.
        H_np=m._H_np, A_np=m._A_np, g_np=m._g_np,
        rho_mode_req=np.asarray(m._rho_mode_req),
        bank_build=np.asarray(m._bank_build),
        tail_policy=np.asarray(getattr(m, "tail_policy", "dense")),
    )


def _merge_shards(path: str) -> dict:
    """Reassemble a multi-host shard-file checkpoint into one global
    record (single-process restore of a pod-written checkpoint)."""
    import glob as _glob
    import re
    base = path[:-4] if path.endswith(".npz") else path
    # a shard file's own name is accepted too — its N pins the shard set
    suffix = re.search(r"\.proc\d+of(\d+)$", base)
    base = re.sub(r"\.proc\d+of\d+$", "", base)
    if suffix:
        n = int(suffix.group(1))
    else:
        first = sorted(_glob.glob(f"{base}.proc0of*.npz"))
        if not first:
            raise FileNotFoundError(
                f"no checkpoint at {path} and no multi-host shard files "
                f"{base}.proc0of*.npz")
        if len(first) > 1:
            # Shard sets from different cluster sizes share the prefix —
            # refusing beats silently reassembling a stale/mixed vintage.
            raise ValueError(
                f"ambiguous checkpoint: multiple shard sets match {base} "
                f"({', '.join(sorted(first))}); delete the stale set or "
                f"pass one shard file explicitly (e.g. {first[0]}) to pin "
                f"the set")
        n = int(first[0].rsplit("of", 1)[1][:-4])
    shards = []
    for k in range(n):
        with np.load(_shard_path(base, k, n), allow_pickle=False) as z:
            shards.append({key: z[key] for key in z.files})
    d0 = shards[0]
    hetero = bool(d0["hetero"])
    rho_mode = str(d0["rho_mode"])
    # Batch-led keys concatenate in process order; replicated/shared keys
    # are identical on every shard (take shard 0's).
    cat0 = ["G", "G_lo", "lo", "hi", "Y", "l_np", "u_np", "g_np"]
    if rho_mode != "shared":
        cat0.append("rho_ind")
    if hetero:
        cat0 += ["Wt_bank", "B_bank", "H", "A", "unx", "unz", "unlam",
                 "bias_all", "H_np", "A_np", "scal_D", "scal_E", "scal_c",
                 "rho_cap"]   # per-problem (B,) caps in the hetero regime
        if d0["B_lo"].size:
            cat0.append("B_lo")
    merged = dict(d0)
    for key in cat0:
        if key in d0:
            merged[key] = np.concatenate([s[key] for s in shards], axis=0)
    if not hetero:
        # shared-regime bias is (N_rho, B, Dp): batch axis is 1
        merged["bias_all"] = np.concatenate(
            [s["bias_all"] for s in shards], axis=1)
    merged["B_n"] = np.asarray(sum(int(s["B_n"]) for s in shards))
    merged["B_pad"] = merged["B_n"]
    merged["n_procs"] = np.asarray(1)
    return merged


def load_batched_solver(path: str, mesh=None, axis_name: str = "qp"):
    """Restore a ``BatchedReLU_QP`` from ``save_batched_solver`` output
    WITHOUT re-factorizing the per-problem banks (IO + H2D only).

    Multi-host checkpoints (shard files written by every process of a
    ``process_local`` solver) restore two ways: on the SAME process
    layout — each process loads its shard and the batch is re-assembled
    globally over ``mesh``, exactly like ``setup(process_local=True)`` —
    or single-process, where all shard files are merged into one local
    solver (pass the same ``path`` prefix either way).
    """
    from ..batch import BatchedReLU_QP, BatchInfo, BatchResults
    from ..classes import Settings
    from ..core.bank import stacked_dim
    from ..ops.fused_step import batch_tile_rows, pad_dim, round_up
    from ..solver import _is_tpu
    from .scaling import Scaling

    t0 = time.perf_counter()
    pc = jax.process_count()
    multi_load = False
    if pc > 1:
        shard = _shard_path(path, jax.process_index(), pc)
        with np.load(shard, allow_pickle=False) as z:
            data = {key: z[key] for key in z.files}
        if int(data.get("n_procs", 1)) != pc:
            raise ValueError(
                f"checkpoint {shard} was written by "
                f"{int(data.get('n_procs', 1))} processes but this cluster "
                f"has {pc} — restore on the same layout, or single-process")
        if mesh is None:
            raise ValueError("multi-process restore requires a mesh "
                             "spanning every process's devices")
        multi_load = True
    else:
        try:
            with np.load(path, allow_pickle=False) as z:
                data = {key: z[key] for key in z.files}
        except FileNotFoundError:
            alt = path if path.endswith(".npz") else path + ".npz"
            try:
                with np.load(alt, allow_pickle=False) as z:
                    data = {key: z[key] for key in z.files}
            except FileNotFoundError:
                data = _merge_shards(path)
        if int(data.get("n_procs", 1)) > 1:
            data = _merge_shards(path)
    stng_kw = json.loads(str(data["settings"]))

    m = BatchedReLU_QP.__new__(BatchedReLU_QP)
    m.info = BatchInfo()
    m.results = BatchResults(info=m.info)
    m.settings = Settings(**stng_kw)
    stng = m.settings
    dtype = stng.precision_dtype

    m.hetero = bool(data["hetero"])
    m.rho_mode = str(data["rho_mode"])
    # multi-process restore: arrays stay host-local through the loads
    # below (B_n is this process's rows), then _globalize() assembles the
    # global batch over the mesh — exactly like setup(process_local=True).
    m._local_setup = multi_load
    m._multi = False
    m.B_n = int(data["B_n"])
    m.B_local = m.B_n
    m.B_pad = int(data["B_pad"])
    m.nx, m.nc = int(data["nx"]), int(data["nc"])
    m.D = stacked_dim(m.nx, m.nc)
    m.Dp = int(data["Dp"])
    m.mesh, m.axis_name = mesh, axis_name
    m.rhos_np = np.asarray(data["rhos"], dtype=np.float64)

    D_s, E_s, c_s = data["scal_D"], data["scal_E"], data["scal_c"]
    m.scal = Scaling(D=D_s, E=E_s, c=c_s, Dinv=1.0 / D_s, Einv=1.0 / E_s,
                     cinv=1.0 / c_s)
    eq = np.asarray(data["eq_pattern"])
    m._eq_pattern = None if eq.size == 0 else eq
    m._l_np, m._u_np = data["l_np"], data["u_np"]
    if "H_np" in data:
        m._H_np, m._A_np, m._g_np = (np.asarray(data["H_np"]),
                                     np.asarray(data["A_np"]),
                                     np.asarray(data["g_np"]))
        m._rho_mode_req = str(data["rho_mode_req"])
        m._bank_build = str(data["bank_build"])
    else:
        # Checkpoint written before the fp64 masters were saved: still
        # loadable/solvable, but update_matrices has nothing to rebuild
        # from (it raises with a clear message).
        m._H_np = m._A_np = m._g_np = None
        m._rho_mode_req = m.rho_mode
        m._bank_build = "auto"
    m.tail_policy = (str(data["tail_policy"]) if "tail_policy" in data
                     else "dense")
    if m.tail_policy == "repack" and (m.hetero or mesh is not None or (
            stng.refine and stng.iter_precision != "highest")):
        m.tail_policy = "dense"   # restored into an unsupported regime

    # Pallas batched kernel only when the saved layout matches what a
    # fresh setup would have padded to (same gate as _pick_pallas).
    m._use_pallas = False
    if not m.hetero and m.rho_mode == "shared" and stng.backend != "xla" \
            and mesh is None and _is_tpu(stng.device) \
            and m.Dp == pad_dim(m.D):
        tile = min(batch_tile_rows(m.Dp, dtype,
                                   iter_precision=stng.iter_precision),
                   m.B_n)
        m._use_pallas = m.B_pad == round_up(m.B_n, max(tile, 8))
    # Hetero kernel gate: same as _pick_pallas_hetero, plus the saved
    # layout must already be lane-padded.
    m._hetero_pallas = False
    if m.hetero and stng.backend != "xla" and mesh is None \
            and _is_tpu(stng.device) and m.Dp == pad_dim(m.D):
        from ..ops.fused_step import aligned_divisor, hetero_tile_rows
        m._hetero_pallas = aligned_divisor(
            m.B_n, hetero_tile_rows(m.Dp, dtype,
                                    iter_precision=stng.iter_precision)) > 0
    m._repack_sched = (m._make_repack_schedule()
                       if m.tail_policy == "repack" else None)

    put = lambda a, rep=False: m._put(jnp.asarray(a, dtype=dtype),
                                      replicated=rep)
    shared_rep = not m.hetero   # shared banks/matrices are replicated
    wd = jnp.bfloat16 if stng.iter_precision == "bf16" else dtype
    m.Wt_bank = m._put(jnp.asarray(data["Wt_bank"], dtype=wd),
                       replicated=shared_rep)
    m._keep_hi = stng.iter_precision == "bf16" and stng.refine
    m._Wt_hi = m._put(jnp.asarray(data["Wt_bank"], dtype=dtype),
                      replicated=shared_rep) if m._keep_hi else None
    m.B_bank = put(data["B_bank"], rep=shared_rep)
    m.H_dev = put(data["H"], rep=shared_rep)
    m.A_dev = put(data["A"], rep=shared_rep)
    m.G = put(data["G"])
    m.lo, m.hi = put(data["lo"]), put(data["hi"])
    m.Y = put(data["Y"])
    m.rhos = put(data["rhos"], rep=True)
    if m.rho_mode == "shared":
        m.rho_ind = jnp.asarray(int(data["rho_ind"]), jnp.int32)
    else:
        m.rho_ind = m._put(jnp.asarray(data["rho_ind"], jnp.int32))
    m._unx = put(data["unx"]) if m.hetero else jnp.asarray(data["unx"],
                                                           dtype=dtype)
    m._unz = put(data["unz"]) if m.hetero else jnp.asarray(data["unz"],
                                                           dtype=dtype)
    m._unlam = put(data["unlam"]) if m.hetero \
        else jnp.asarray(data["unlam"], dtype=dtype)
    m.rho_cap = (np.asarray(data["rho_cap"]) if "rho_cap" in data
                 else (np.full(m.B_n, np.inf) if m.hetero
                       else float("inf")))
    # eps-floor guard state for update_settings, rebuilt from the
    # restored scaled A (stored at iteration dtype — close enough for a
    # warning heuristic; multi-process restores use the local shard).
    from ..batch import _hetero_eps_floor
    if m.hetero:
        m._eps_floor = _hetero_eps_floor(
            m.rho_cap, np.asarray(data["A"], np.float64), dtype, m.nx)
    else:
        m._A_scaled_np = np.asarray(data["A"], np.float64)
        m._sigma_max_sq = None
    m._rho_eff = None
    if stng.alpha != 1.0:
        from ..core.bank import effective_rho_ladder as _eff
        from ..core.bank import equality_mask as _eqm
        if m.hetero:
            eq_b = _eqm(m._l_np, m._u_np, stng.eq_tol)
            caps = np.broadcast_to(np.asarray(m.rho_cap, float),
                                   (eq_b.shape[0],))
            m._rho_eff = put(np.stack(
                [_eff(m.rhos_np, eq_b[i], caps[i])
                 for i in range(eq_b.shape[0])]))
        else:
            m._rho_eff = put(_eff(m.rhos_np, m._eq_pattern,
                                  float(m.rho_cap)), rep=True)
    # Residual unscale weights are derived state (scal + settings), not
    # serialized — THE shared derivation (scaling.residual_unscale_weights)
    # guarantees restored solvers terminate against the same units.
    from .scaling import residual_unscale_weights
    m._w_pri = m._w_dua = None
    wp, wd = residual_unscale_weights(m.scal, stng)
    if wp is not None:
        if m.hetero:
            m._w_pri = m._put(jnp.asarray(
                np.broadcast_to(wp, (m.B_n, m.nc)), dtype=dtype))
            m._w_dua = m._put(jnp.asarray(wd, dtype=dtype))
        else:
            m._w_pri = jnp.asarray(wp, dtype=dtype)
            m._w_dua = jnp.asarray(wd, dtype=dtype)
    if "G_lo" in data:
        g_lo = np.asarray(data["G_lo"])
        m._G_lo = put(g_lo) if g_lo.size else None
        b_lo = np.asarray(data["B_lo"])
        m._B_lo = put(b_lo, rep=shared_rep) if b_lo.size else None
        m.bias_all = (m._put(jnp.asarray(data["bias_all"], dtype=dtype))
                      if m.hetero
                      else m._put_bias_shared(
                          jnp.asarray(data["bias_all"], dtype=dtype)))
    else:
        # Pre-0.3 checkpoint without the stored bias: recompute from the
        # restored (iteration-dtype) G with zero residuals.
        m._G_lo = None
        m._B_lo = None
        m.bias_all = m._bias_refresh()
    if multi_load:
        # Assemble this process's restored rows into the global sharded
        # batch — the same path setup(process_local=True) takes.
        m._globalize()
    jax.block_until_ready((m.Wt_bank, m.bias_all, m.Y))
    m.info.setup_time = time.perf_counter() - t0
    m.info.update_time = 0.0
    m._ready = True
    return m
