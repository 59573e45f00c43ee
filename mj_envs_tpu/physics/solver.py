"""Constraint solver: primal Newton over qacc (MuJoCo's default solver for
this suite — `DAPG_assets.xml:3` sets iterations=20, noslip_iterations=20
with the default Newton solver and pyramidal cones), plus the noslip
post-pass.

The optimization problem is strictly convex:

  min_qacc 0.5 (qacc - qacc_smooth)^T M (qacc - qacc_smooth) + sum_i s_i(jar_i)

  jar_i = J_i qacc - aref_i
  s_i   = 0.5 D jar^2            (one-sided rows, active when jar < 0)
          Huber(D, fl)           (friction-loss rows: quadratic inside
                                  |D jar| <= fl, linear outside)

so any convergent method reaches the same qacc; we run a fixed number of
exact-Hessian Newton steps with a safeguarded exact linesearch.  All shapes
static; batched via vmap (the Hessian solve is a (nv, nv) Cholesky per env —
tiny, maps to MXU batched ops).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .constraint import Rows, j_matvec, jt_matvec, jtwj


def _forces(rows: Rows, jar: jnp.ndarray):
    """Constraint force f(jar) and the active-quadratic mask."""
    is_fric = rows.floss > 0
    f_quad = -rows.D * jar
    f_fric = jnp.clip(f_quad, -rows.floss, rows.floss)
    f_one = jnp.where(jar < 0, f_quad, 0.0)
    f = jnp.where(is_fric, f_fric, f_one)
    quad = jnp.where(
        is_fric, jnp.abs(f_quad) <= rows.floss, jar < 0) & rows.active
    return f * rows.active, quad


def _cost_rows(rows: Rows, jar: jnp.ndarray):
    is_fric = rows.floss > 0
    quad_cost = 0.5 * rows.D * jar * jar
    lin_cost = rows.floss * jnp.abs(jar) \
        - 0.5 * rows.floss ** 2 / jnp.maximum(rows.D, 1e-30)
    fric_cost = jnp.where(jnp.abs(rows.D * jar) <= rows.floss,
                          quad_cost, lin_cost)
    one_cost = jnp.where(jar < 0, quad_cost, 0.0)
    return jnp.sum(jnp.where(is_fric, fric_cost, one_cost) * rows.active)


def _total_cost(M, qacc, qacc_smooth, rows, jar):
    dq = qacc - qacc_smooth
    return 0.5 * dq @ (M @ dq) + _cost_rows(rows, jar)


class SolveResult(NamedTuple):
    qacc: jnp.ndarray
    efc_force: jnp.ndarray
    jar: jnp.ndarray


def newton_solve(M: jnp.ndarray, qacc_smooth: jnp.ndarray, rows: Rows,
                 qacc_warmstart: jnp.ndarray, iterations: int,
                 ls_iterations: int = 16) -> SolveResult:
    # Start from the lower-cost of warmstart / smooth (mj_fwdConstraint).
    jar_s = j_matvec(rows, qacc_smooth) - rows.aref
    jar_w = j_matvec(rows, qacc_warmstart) - rows.aref
    cost_s = _total_cost(M, qacc_smooth, qacc_smooth, rows, jar_s)
    cost_w = _total_cost(M, qacc_warmstart, qacc_smooth, rows, jar_w)
    use_w = cost_w < cost_s
    qacc = jnp.where(use_w, qacc_warmstart, qacc_smooth)
    jar = jnp.where(use_w, jar_w, jar_s)

    nv = qacc.shape[0]
    eye = jnp.eye(nv, dtype=qacc.dtype)

    # Early exit when the cost improvement falls to the dtype noise floor
    # (f32 rollouts typically converge in ~5 of the 20 budgeted
    # iterations; f64 parity runs exit at ~2e-15 relative, preserving the
    # oracle match).  Under vmap this lifts to "run while ANY env is
    # unconverged", which still saves most iterations in steady state
    # (and is why parallel/vector.chunked_vmap exists: smaller per-loop
    # batches exit earlier).
    # MJE_NEWTON_TOL_SCALE (f32 path ONLY; default = the historical 10)
    # loosens/tightens the exit threshold in units of machine epsilon —
    # the f64 oracle-parity graph keeps the exact constant 10*eps.
    if qacc.dtype == jnp.float32:
        import os
        # Default 300*eps(f32) ~= 3.6e-5 relative: still conservative
        # for an f32 solver (mujoco's own f64 default is 1e-8 on a
        # scaled cost); together with the noslip default below measured
        # +5% rollout throughput at the 4096-env north-star config vs
        # the round-5 interim (100, 1e-4) defaults, with golden-policy
        # behavioral tests and the 4-task TPU e2e unchanged
        # (tools/noslip_tol_probe.py records the accuracy bound).
        _scale = float(os.environ.get("MJE_NEWTON_TOL_SCALE", "300.0"))
    else:
        _scale = 10.0
    tol_rel = _scale * jnp.finfo(qacc.dtype).eps
    cost0 = jnp.where(use_w, cost_w, cost_s)

    # f32 path: the linesearch kernel also returns the constraint-row
    # cost at the chosen alpha, and the M-quadratic part is carried
    # incrementally (quad(a) = quad + a*c1 + a^2/2*c2) — saving a full
    # row pass + M matvec per iteration.  The f64 parity path keeps the
    # historical explicit _total_cost evaluation, bit-for-bit — and a
    # Python-level distinct while-loop whose carry has NO quad_cost
    # element at all, so the oracle-parity graph does not depend on XLA
    # dead-carry elimination (ADVICE r4 item 1).
    fused_cost = qacc.dtype == jnp.float32

    def _common(qacc, jar):
        """Per-iteration work shared verbatim by both paths."""
        f, quad = _forces(rows, jar)
        grad = M @ (qacc - qacc_smooth) - jt_matvec(rows, f)
        w = jnp.where(quad, rows.D, 0.0)
        H = M + jtwj(rows, w)
        # Levenberg guard for numerical safety (H is PD in exact math,
        # but f32 roundoff can push it indefinite in near-singular states
        # — scale the guard with the diagonal and the dtype epsilon).
        lm = 10.0 * jnp.finfo(qacc.dtype).eps * jnp.mean(jnp.diag(H))
        # SPD solve dispatches through kernels.chol_solve: plain
        # Cholesky+cho_solve unbatched (f64 parity bits unchanged) and
        # on CPU; a Pallas batch-minor factorization on TPU f32 under
        # vmap (tests/test_kernels.py checks elementwise equivalence).
        from .kernels import chol_solve
        p = -chol_solve(H + lm * eye, grad)
        # If the factorization still failed (NaN), fall back to a plain
        # diagonally-preconditioned gradient step so one bad state cannot
        # poison the trajectory with NaNs.
        p_ok = jnp.all(jnp.isfinite(p))
        p = jnp.where(p_ok, p, -grad / jnp.maximum(jnp.diag(H), 1e-8))

        # Exact linesearch on the piecewise-quadratic phi(alpha):
        # 12 bracket-doubling + ls_iterations safeguarded-Newton steps,
        # via kernels.linesearch_cached (same dispatch scheme — the
        # unbatched path is op-for-op the historical inline search).
        Jp = j_matvec(rows, p)
        Mp = M @ p
        c1 = p @ (M @ (qacc - qacc_smooth))
        c2 = p @ Mp
        return p, Jp, c1, c2

    if fused_cost:
        dq0 = qacc - qacc_smooth
        quad_cost0 = 0.5 * dq0 @ (M @ dq0)

        def body(carry):
            qacc, jar, it, prev_cost, quad_cost, done = carry
            p, Jp, c1, c2 = _common(qacc, jar)
            from .kernels import linesearch_cost_cached
            alpha, rows_cost = linesearch_cost_cached(12, ls_iterations)(
                jar, Jp, rows.D, rows.floss, rows.active, c1, c2)
            quad_cost_new = quad_cost + alpha * c1 \
                + 0.5 * alpha * alpha * c2
            cost_new = quad_cost_new + rows_cost
            qacc_new = qacc + alpha * p
            jar_new = jar + alpha * Jp
            improved = prev_cost - cost_new
            done_new = improved <= tol_rel * (1.0 + jnp.abs(cost_new))
            # Reject non-improving steps (keeps the fixed-point stable).
            keep = improved >= 0
            qacc_new = jnp.where(keep, qacc_new, qacc)
            jar_new = jnp.where(keep, jar_new, jar)
            cost_new = jnp.where(keep, cost_new, prev_cost)
            quad_cost_new = jnp.where(keep, quad_cost_new, quad_cost)
            return (qacc_new, jar_new, it + 1, cost_new, quad_cost_new,
                    done_new)

        def cond(carry):
            _, _, it, _, _, done = carry
            return (it < iterations) & ~done

        qacc, jar, _, _, _, _ = jax.lax.while_loop(
            cond, body, (qacc, jar, jnp.asarray(0, jnp.int32), cost0,
                         quad_cost0, jnp.asarray(False)))
    else:
        def body(carry):
            qacc, jar, it, prev_cost, done = carry
            p, Jp, c1, c2 = _common(qacc, jar)
            from .kernels import linesearch_cached
            alpha = linesearch_cached(12, ls_iterations)(
                jar, Jp, rows.D, rows.floss, rows.active, c1, c2)
            qacc_new = qacc + alpha * p
            jar_new = jar + alpha * Jp
            cost_new = _total_cost(M, qacc_new, qacc_smooth, rows,
                                   jar_new)
            improved = prev_cost - cost_new
            done_new = improved <= tol_rel * (1.0 + jnp.abs(cost_new))
            keep = improved >= 0
            qacc_new = jnp.where(keep, qacc_new, qacc)
            jar_new = jnp.where(keep, jar_new, jar)
            cost_new = jnp.where(keep, cost_new, prev_cost)
            return (qacc_new, jar_new, it + 1, cost_new, done_new)

        def cond(carry):
            _, _, it, _, done = carry
            return (it < iterations) & ~done

        qacc, jar, _, _, _ = jax.lax.while_loop(
            cond, body, (qacc, jar, jnp.asarray(0, jnp.int32), cost0,
                         jnp.asarray(False)))
    f, _ = _forces(rows, jar)
    return SolveResult(qacc=qacc, efc_force=f, jar=jar)


def noslip(M: jnp.ndarray, rows: Rows, res: SolveResult,
           n_fric_dof: int, ncmax: int, iterations: int,
           M_fac: jnp.ndarray | None = None) -> SolveResult:
    """Noslip post-pass: modified PGS over friction components only,
    without constraint regularization (suppresses friction drift; the
    reference model sets noslip_iterations=20, `DAPG_assets.xml:3`).

    Gauss-Seidel sweeps over (a) dof friction-loss rows (force box-clamped
    to +-frictionloss) and (b) pyramidal facet +- pairs per contact (the
    facet *difference* is updated with the sum — i.e. the normal force —
    held fixed, and both facets kept >= 0).
    """
    nv = M.shape[0]
    nefc = rows.aref.shape[0]
    dtype = M.dtype

    # Build the friction "update directions": one per dof-friction row and
    # one per (contact, friction-direction) facet pair.
    # dof rows are the first n_fric_dof rows; contact rows are the last
    # ncmax*6, laid out [+t1, -t1, +t2, -t2, +tor, -tor] per contact.
    con_base = nefc - ncmax * 6

    # Direction matrices (static structure).  Facet +/- pairs are adjacent
    # rows of the contact block — address them by reshape, not strided
    # gathers (strided row gathers of J-sized arrays lower poorly on TPU).
    # dof friction: d_k = J_row (unit dof row); facet pairs:
    # Jd = (J+ - J-) / 2 = mu * Jt ; bd = (aref+ - aref-) / 2.
    if rows.Jbase is not None:
        # Base-compressed layout: the per-contact direction rows
        # mu_d * Jt_d ARE Jbase rows 1..3 — no facet reconstruction.
        Jd_pairs = rows.Jbase.reshape(ncmax, 4, nv)[:, 1:4] \
            .reshape(ncmax * 3, nv)
    else:
        Jcon = rows.J[con_base:].reshape(ncmax * 3, 2, nv)
        Jd_pairs = 0.5 * (Jcon[:, 0] - Jcon[:, 1])         # (3C, nv)
    acon = rows.aref[con_base:].reshape(ncmax * 3, 2)
    bd_pairs = 0.5 * (acon[:, 0] - acon[:, 1])
    J_dof = rows.J[:n_fric_dof]
    b_dof = rows.aref[:n_fric_dof]

    D_all = jnp.concatenate([J_dof, Jd_pairs], axis=0)     # (R, nv)
    b_all = jnp.concatenate([b_dof, bd_pairs])

    # X = M^-1 D^T is everything noslip needs from the mass matrix:
    # A = D X, a_diag = diag(A), and the final qacc update is X (u-u0).
    # f64 parity path: explicit inv, exactly the historical op order
    # (keeps the oracle-diffed trajectory bits stable).  f32: SPD solve
    # through kernels.chol_solve_mat — under vmap on TPU a Pallas
    # batch-minor kernel (XLA's batched cholesky + matrix-RHS
    # triangular_solve lowers to row-sequential HBM loops: 18.9 ms at
    # (4096, 33, 33) on v5e, the largest single cost inside noslip).
    if dtype == jnp.float64:
        Minv = jnp.linalg.inv(M)
        MD = D_all @ Minv                                  # (R, nv)
        a_diag = jnp.sum(MD * D_all, axis=1)               # (R,)
        X = MD.T                                           # (nv, R)
    elif M_fac is not None:
        # Reuse the mass-matrix factor computed for qacc_smooth
        # (kernels.chol_solve_factor) — skips a second in-kernel
        # factorization of the same M.
        from .kernels import chol_solve_mat_fac
        X = chol_solve_mat_fac(M_fac, D_all.T)             # (nv, R)
        a_diag = jnp.sum(D_all.T * X, axis=0)              # (R,)
    else:
        from .kernels import chol_solve_mat
        X = chol_solve_mat(M, D_all.T)                     # (nv, R)
        a_diag = jnp.sum(D_all.T * X, axis=0)              # (R,)
    a_safe = jnp.where(a_diag > 1e-12, a_diag, 1.0)

    fl_dof = rows.floss[:n_fric_dof]
    actcon = rows.active[con_base:].reshape(ncmax * 3, 2)
    active_pairs = actcon[:, 0] & actcon[:, 1]

    # State: qacc, plus per-row friction variables.
    f_dof0 = res.efc_force[:n_fric_dof]
    fcon0 = res.efc_force[con_base:].reshape(ncmax * 3, 2)
    fp0 = fcon0[:, 0]
    fm0 = fcon0[:, 1]
    u0 = jnp.concatenate([f_dof0, fp0 - fm0])              # friction vars
    ssum = fp0 + fm0                                       # fixed per pair

    lo = jnp.concatenate([-fl_dof, -ssum])
    hi = jnp.concatenate([fl_dof, ssum])
    live = jnp.concatenate(
        [jnp.ones(n_fric_dof, dtype=bool), active_pairs])

    # Gauss-Seidel in residual form: carrying r = D qacc - b instead of
    # qacc makes each row update O(R) VPU work with no dynamic-slice of
    # (nv)-vectors, and hoists the qacc reconstruction to one matmul at
    # the end.  A = D Minv D^T is built once on the MXU.  The sweep
    # itself dispatches through kernels.make_noslip_sweep: lax.scan on
    # the f64/CPU parity path, a Pallas VMEM-resident kernel on TPU f32
    # under vmap (identical update order; tests/test_kernels.py).
    from .kernels import noslip_sweep_cached
    if dtype == jnp.float64:
        A = MD @ D_all.T                                   # (R, R)
    else:
        A = D_all @ X                                      # (R, R)
    gate = (live & (a_diag > 1e-12)).astype(dtype)
    r0 = D_all @ res.qacc - b_all                          # (R,)

    # f32 TPU path: per-block tolerance exit in the sweep kernel
    # (MJE_NOSLIP_TOL, relative to the force scale; 0 disables).
    # mujoco's mj_solNoSlip likewise terminates on
    # mjOption.noslip_tolerance (default 1e-6), not always on maxiter;
    # the f64 oracle-parity scan keeps the fixed trip count.
    # Default 1e-3 (of the largest clamp bound in the 128-env block):
    # measured max |dqacc| 3.6e-4 relative to the batch qacc scale vs
    # the full fixed-trip sweep on contact-rich hammer states
    # (tools/noslip_tol_probe.py, v5e) — below upstream f32 solver
    # noise — for most of a +5% rollout-throughput gain at 4096 envs.
    tol = 0.0
    if dtype == jnp.float32:
        import os
        tol = float(os.environ.get("MJE_NOSLIP_TOL", "1e-3"))
    u = noslip_sweep_cached(iterations, tol)(
        A, a_safe, lo, hi, gate, r0, u0)
    if dtype == jnp.float64:
        qacc = res.qacc + Minv @ (D_all.T @ (u - u0))
    else:
        qacc = res.qacc + X @ (u - u0)

    f_dof = u[:n_fric_dof]
    ud = u[n_fric_dof:]
    fp = 0.5 * (ssum + ud)
    fm = 0.5 * (ssum - ud)
    # Rebuild efc by concatenation (dof block | untouched middle |
    # interleaved facet pairs) — strided scatters serialize on TPU.
    inter = jnp.stack([fp, fm], axis=-1).reshape(ncmax * 6)
    efc = jnp.concatenate(
        [f_dof, res.efc_force[n_fric_dof:con_base], inter])
    jar = j_matvec(rows, qacc) - rows.aref
    return SolveResult(qacc=qacc, efc_force=efc, jar=jar)
