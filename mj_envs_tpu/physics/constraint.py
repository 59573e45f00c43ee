"""Constraint row assembly: friction-loss, joint/tendon limits, pyramidal
contacts — with MuJoCo's impedance / reference-acceleration / regularizer
semantics (validated against oracle efc_* arrays in tests).

Row layout is static: [dof friction | joint limits | tendon limits |
ncmax contacts x 6 facet slots], with dynamic activity masks.
"""
from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax.numpy as jnp

from .model import Model
from .kinematics import Kin, point_jacobian
from .collision.driver import CompactContacts

MINVAL = 1e-15
MAXIMP = 0.9999
MINIMP = 0.0001


class Rows(NamedTuple):
    """Constraint rows.  Two storage layouts share one consumer API
    (`j_matvec`/`jt_matvec`/`jtwj` below):

    * dense (f64 oracle-parity path): `Jbase is None`, `J` holds ALL
      nefc rows including the 6 pyramid facets per contact — the
      historical layout, op-for-op.
    * base-compressed (f32 TPU path): `J` holds only the NON-contact
      rows; `Jbase` (ncmax*4, nv) holds per contact
      [Jn, mu1*Jt1, mu2*Jt2, mu3*Jtor].  Facet rows are algebraically
      Jn +- mu_d*Jt_d, so every J pass (jar, grad, Hessian, Jp)
      reconstructs them on the fly from 4 base products instead of
      reading 6 dense rows — a 296 -> 232 row cut on hammer for the
      solver's dominant memory traffic (VERDICT r4 item 3).

    The per-row vectors (aref, D, R, floss, active, oneside, pos) are
    ALWAYS full facet-expanded nefc length, so force/cost/linesearch
    logic and the efc_force layout are identical in both layouts.
    """

    J: jnp.ndarray        # dense: (nefc, nv); compressed: (nother, nv)
    aref: jnp.ndarray     # (nefc,)
    D: jnp.ndarray        # (nefc,) inverse regularizer
    R: jnp.ndarray        # (nefc,)
    floss: jnp.ndarray    # (nefc,) friction-loss bound (0 = not a
                          #  friction row)
    active: jnp.ndarray   # (nefc,) row exists
    oneside: jnp.ndarray  # (nefc,) force constrained >= 0 (limits,
                          #  contacts); friction rows are two-sided Huber
    pos: jnp.ndarray      # (nefc,) violation (diagnostics/tests)
    Jbase: jnp.ndarray | None = None  # (ncmax*4, nv) or None (dense)


def j_matvec(rows: Rows, x: jnp.ndarray) -> jnp.ndarray:
    """J @ x over the full facet-expanded row set -> (nefc,)."""
    if rows.Jbase is None:
        return rows.J @ x
    other = rows.J @ x                                   # (nother,)
    base = (rows.Jbase @ x).reshape(-1, 4)               # (C, 4)
    pn = base[:, 0:1]
    pd = base[:, 1:4]
    plus = pn + pd                                       # (C, 3)
    minus = pn - pd
    exp = jnp.stack([plus[:, 0], minus[:, 0], plus[:, 1], minus[:, 1],
                     plus[:, 2], minus[:, 2]], axis=-1)  # (C, 6)
    return jnp.concatenate([other, exp.reshape(-1)])


def jt_matvec(rows: Rows, f: jnp.ndarray) -> jnp.ndarray:
    """J.T @ f for facet-expanded f (nefc,) -> (nv,)."""
    if rows.Jbase is None:
        return rows.J.T @ f
    nother = rows.J.shape[0]
    fo = f[:nother]
    fc = f[nother:].reshape(-1, 6)                       # (C, 6)
    fsum = fc[:, 0] + fc[:, 1] + fc[:, 2] + fc[:, 3] + fc[:, 4] + fc[:, 5]
    coef = jnp.stack([fsum, fc[:, 0] - fc[:, 1], fc[:, 2] - fc[:, 3],
                      fc[:, 4] - fc[:, 5]], axis=-1)     # (C, 4)
    return rows.J.T @ fo + rows.Jbase.T @ coef.reshape(-1)


def jtwj(rows: Rows, w: jnp.ndarray) -> jnp.ndarray:
    """J.T diag(w) J for facet-expanded weights -> (nv, nv).

    Contact block: sum_f w_f (Jn + s_f mu Jd)(...)^T = Jb^T S Jb with a
    per-contact symmetric PSD 4x4 coupling S (S00 = sum w, S0d = Sd0 =
    w+_d - w-_d, Sdd = w+_d + w-_d, zero elsewhere) — applied as cheap
    row combinations before ONE (nv,4C)x(4C,nv) contraction."""
    if rows.Jbase is None:
        return (rows.J.T * w) @ rows.J
    nv = rows.J.shape[1]
    nother = rows.J.shape[0]
    wo = w[:nother]
    wc = w[nother:].reshape(-1, 6)                       # (C, 6)
    s0 = (wc[:, 0] + wc[:, 1] + wc[:, 2] + wc[:, 3]
          + wc[:, 4] + wc[:, 5])                         # (C,)
    sd = jnp.stack([wc[:, 0] + wc[:, 1], wc[:, 2] + wc[:, 3],
                    wc[:, 4] + wc[:, 5]], axis=-1)       # (C, 3)
    dd = jnp.stack([wc[:, 0] - wc[:, 1], wc[:, 2] - wc[:, 3],
                    wc[:, 4] - wc[:, 5]], axis=-1)       # (C, 3)
    Jb = rows.Jbase.reshape(-1, 4, nv)
    Jn = Jb[:, 0]                                        # (C, nv)
    Jd = Jb[:, 1:4]                                      # (C, 3, nv)
    Y0 = s0[:, None] * Jn + jnp.sum(dd[:, :, None] * Jd, axis=1)
    Yd = dd[:, :, None] * Jn[:, None, :] + sd[:, :, None] * Jd
    Y = jnp.concatenate([Y0[:, None, :], Yd], axis=1)    # (C, 4, nv)
    return (rows.J.T * wo) @ rows.J \
        + rows.Jbase.T @ Y.reshape(-1, nv)


def expand_J(rows: Rows) -> jnp.ndarray:
    """Materialize the full (nefc, nv) dense J (tests/diagnostics)."""
    if rows.Jbase is None:
        return rows.J
    nv = rows.J.shape[1]
    nother = rows.J.shape[0]
    Jb = rows.Jbase.reshape(-1, 4, nv)
    Jn = Jb[:, 0:1]
    Jd = Jb[:, 1:4]
    plus = Jn + Jd
    minus = Jn - Jd
    facets = jnp.stack([plus[:, 0], minus[:, 0], plus[:, 1],
                        minus[:, 1], plus[:, 2], minus[:, 2]], axis=1)
    # dead facet slots are zero rows in the dense layout
    live = rows.active[nother:].reshape(-1, 6).astype(rows.J.dtype)
    return jnp.concatenate(
        [rows.J, (facets * live[..., None]).reshape(-1, nv)])


def _impedance(solimp, pos_m):
    """MuJoCo impedance d(x), x = |pos - margin| / width."""
    dmin, dmax, width, mid, power = (solimp[..., 0], solimp[..., 1],
                                     solimp[..., 2], solimp[..., 3],
                                     solimp[..., 4])
    x = jnp.clip(jnp.abs(pos_m) / jnp.maximum(width, MINVAL), 0.0, 1.0)
    y_lo = jnp.power(jnp.maximum(x, 1e-30), power) \
        / jnp.power(jnp.maximum(mid, MINVAL), power - 1)
    y_hi = 1.0 - jnp.power(jnp.maximum(1.0 - x, 1e-30), power) \
        / jnp.power(jnp.maximum(1.0 - mid, MINVAL), power - 1)
    y = jnp.where(x <= mid, y_lo, y_hi)
    return jnp.clip(dmin + y * (dmax - dmin), MINIMP, MAXIMP)


def _kb(solref, solimp):
    """Stiffness/damping from solref (positive: time-constant form)."""
    dmax = solimp[..., 1]
    timeconst, dampratio = solref[..., 0], solref[..., 1]
    direct = solref[..., 0] <= 0
    k = jnp.where(direct, -solref[..., 0],
                  1.0 / jnp.maximum(dmax ** 2 * timeconst ** 2
                                    * dampratio ** 2, MINVAL))
    b = jnp.where(direct, -solref[..., 1],
                  2.0 / jnp.maximum(dmax * timeconst, MINVAL))
    return k, b


def make_rows(m: Model, kin: Kin, qpos: jnp.ndarray, qvel: jnp.ndarray,
              con: CompactContacts) -> Rows:
    """Dispatch: f64 (oracle-parity path) keeps the historical op set
    VERBATIM — the trajectory gate is bit-exact vs mujoco, and any HLO
    restructuring (even value-identical) changes XLA fusion/FMA
    contraction enough to drift door/relocate past 1e-12 within steps.
    f32 (TPU throughput path) uses the gather/scatter-free variant."""
    if qpos.dtype == jnp.float64:
        return _make_rows_ref(m, kin, qpos, qvel, con)
    return _make_rows_fast(m, kin, qpos, qvel, con)


def _make_rows_fast(m: Model, kin: Kin, qpos: jnp.ndarray,
                    qvel: jnp.ndarray, con: CompactContacts) -> Rows:
    s = m.spec
    dtype = qpos.dtype
    nv = s.nv

    Js, arefs, Ds, Rs, fls, actives, onesides, poss = \
        [], [], [], [], [], [], [], []

    # ---- dof friction rows (always active) -------------------------------
    fr_dofs = np.nonzero(s.dof_hasfrictionloss)[0]
    if len(fr_dofs):
        Jf = jnp.zeros((len(fr_dofs), nv), dtype=dtype)
        Jf = Jf.at[jnp.arange(len(fr_dofs)), fr_dofs].set(1.0)
        imp = _impedance(m.dof_solimp_fri[fr_dofs], jnp.zeros(
            len(fr_dofs), dtype=dtype))
        k, b = _kb(m.dof_solref_fri[fr_dofs], m.dof_solimp_fri[fr_dofs])
        aref = -b * qvel[fr_dofs]
        R = jnp.maximum(MINVAL,
                        (1 - imp) / imp * m.dof_invweight0[fr_dofs])
        Js.append(Jf)
        arefs.append(aref)
        Rs.append(R)
        fls.append(m.dof_frictionloss[fr_dofs])
        actives.append(jnp.ones(len(fr_dofs), dtype=bool))
        onesides.append(jnp.zeros(len(fr_dofs), dtype=bool))
        poss.append(jnp.zeros(len(fr_dofs), dtype=dtype))

    # ---- joint limit rows -------------------------------------------------
    lim_jnts = np.nonzero(s.jnt_limited)[0]
    if len(lim_jnts):
        q = qpos[lim_jnts]
        lo = m.jnt_range[lim_jnts, 0]
        hi = m.jnt_range[lim_jnts, 1]
        dist_lo = q - lo
        dist_hi = hi - q
        lower = dist_lo < dist_hi
        dist = jnp.where(lower, dist_lo, dist_hi)
        sgn = jnp.where(lower, 1.0, -1.0)
        margin = m.jnt_margin[lim_jnts]
        act = dist < margin
        # One-hot multiply, not .at[] scatter: under vmap a batched-value
        # scatter lowers to a serial per-env op on TPU.
        E_lim = np.zeros((len(lim_jnts), nv), dtype=np.float32)
        E_lim[np.arange(len(lim_jnts)), lim_jnts] = 1.0
        Jl = jnp.asarray(E_lim, dtype=dtype) * sgn[:, None]
        imp = _impedance(m.jnt_solimp_lim[lim_jnts], dist - margin)
        k, b = _kb(m.jnt_solref_lim[lim_jnts], m.jnt_solimp_lim[lim_jnts])
        aref = -b * (sgn * qvel[lim_jnts]) - k * imp * (dist - margin)
        R = jnp.maximum(MINVAL,
                        (1 - imp) / imp * m.dof_invweight0[lim_jnts])
        actf = act.astype(dtype)
        Js.append(Jl * actf[:, None])
        arefs.append(aref * actf)
        Rs.append(R)
        fls.append(jnp.zeros(len(lim_jnts), dtype=dtype))
        actives.append(act)
        onesides.append(jnp.ones(len(lim_jnts), dtype=bool))
        poss.append(dist)

    # ---- tendon limit rows -------------------------------------------------
    lim_tens = np.nonzero(s.ten_limited)[0]
    if len(lim_tens):
        W = m.ten_coef[lim_tens]                 # (T, nv)
        length = W @ qpos
        lo = m.ten_range[lim_tens, 0]
        hi = m.ten_range[lim_tens, 1]
        dist_lo = length - lo
        dist_hi = hi - length
        lower = dist_lo < dist_hi
        dist = jnp.where(lower, dist_lo, dist_hi)
        sgn = jnp.where(lower, 1.0, -1.0)
        margin = m.ten_margin[lim_tens]
        act = dist < margin
        Jt = sgn[:, None] * W
        imp = _impedance(m.ten_solimp_lim[lim_tens], dist - margin)
        k, b = _kb(m.ten_solref_lim[lim_tens], m.ten_solimp_lim[lim_tens])
        aref = -b * (Jt @ qvel) - k * imp * (dist - margin)
        R = jnp.maximum(MINVAL,
                        (1 - imp) / imp * m.ten_invweight0[lim_tens])
        actf = act.astype(dtype)
        Js.append(Jt * actf[:, None])
        arefs.append(aref * actf)
        Rs.append(R)
        fls.append(jnp.zeros(len(lim_tens), dtype=dtype))
        actives.append(act)
        onesides.append(jnp.ones(len(lim_tens), dtype=bool))
        poss.append(dist)

    # ---- contact rows (ncmax x 6 facet slots) ------------------------------
    ncmax = con.dist.shape[0]
    # Per-pair body ids / translational invweights are static model data:
    # look them up per PAIR (2-D tables, one vectorized gather each) rather
    # than per contact body — scalar (1-D-table) gathers under vmap lower
    # to ~1 ms serial ops on TPU (round-4 trace: constraint.py gathers were
    # ~4.5 ms of the 44.6 ms hammer substep at 4096 envs).
    gb = np.asarray(s.geom_bodyid)
    pair_bodies = jnp.asarray(
        np.stack([gb[np.asarray(s.pair_geom1)],
                  gb[np.asarray(s.pair_geom2)]], axis=1))      # (P, 2)
    bp = pair_bodies[con.pairid]                               # (C, 2)
    b1 = bp[..., 0]
    b2 = bp[..., 1]
    jac1p, jac1r = point_jacobian(m, kin, con.pos, b1)   # (C, 3, nv)
    jac2p, jac2r = point_jacobian(m, kin, con.pos, b2)
    djp = jac2p - jac1p
    djr = jac2r - jac1r
    n = con.frame[:, 0]
    t1 = con.frame[:, 1]
    t2 = con.frame[:, 2]
    # Broadcast-multiply-sum over the 3-wide spatial axis: einsum here
    # becomes a batched 3-wide dot_general padded to the 128-wide MXU.
    Jn = jnp.sum(n[..., None] * djp, axis=-2)            # (C, nv)
    Jt1 = jnp.sum(t1[..., None] * djp, axis=-2)
    Jt2 = jnp.sum(t2[..., None] * djp, axis=-2)
    Jtor = jnp.sum(n[..., None] * djr, axis=-2)

    # All per-pair solver parameters in ONE (P, 16) table -> one gather.
    invw_pair = (m.body_invweight0[pair_bodies[:, 0], 0]
                 + m.body_invweight0[pair_bodies[:, 1], 0])    # (P,) static
    ptab = jnp.concatenate(
        [m.pair_friction,                                # 0:5   mu
         m.pair_margin[:, None],                         # 5     margin
         m.pair_gap[:, None],                            # 6     gap
         m.pair_solref,                                  # 7:9
         m.pair_solimp,                                  # 9:14
         invw_pair[:, None],                             # 14
         jnp.zeros_like(invw_pair)[:, None]], axis=-1)   # pad to 16
    prow = ptab[con.pairid]                              # (C, 16)
    mu = prow[..., 0:5]
    margin = prow[..., 5]
    gap = prow[..., 6]
    solref = prow[..., 7:9]
    solimp = prow[..., 9:14]
    invw = prow[..., 14]
    incmargin = margin - gap
    pos_m = con.dist - incmargin
    imp = _impedance(solimp, pos_m)                      # (C,)
    k, b = _kb(solref, solimp)
    mu1 = mu[:, 0]
    # mj_diagApprox, determined empirically against the oracle across
    # mu in {0.1..3} and condim in {1,3,4}: pyramidal rows use
    # 2*max(2, mu^2*(1+mu^2)) * (trans invweight sum); frictionless
    # condim=1 rows use the plain invweight sum (verified via explicit
    # <pair condim=1> — a geom-level condim=1 is silently promoted to 3
    # by mj_contactParam when the partner geom has condim 3, which is
    # why only pair-level probes expose this).  impratio=1 throughout
    # this suite; division kept for parameter parity.
    diag_pyr = 2.0 * jnp.maximum(2.0, mu1 * mu1 * (1.0 + mu1 * mu1)) \
        * invw / s.impratio
    diag_n = invw
    condim = con.condim

    # Base-compressed contact storage (see Rows docstring): 4 rows per
    # contact [Jn, mu1*Jt1, mu2*Jt2, mu3*Jtor] instead of 6 dense
    # pyramid facets.  Direction row d is live iff condim > d+1; masked
    # here so inactive/garbage narrowphase slots contribute exact zeros
    # to every matvec.  condim=1 (normal-only) zeroes all direction
    # rows, making facet slot 0 expand to the pure normal row.
    is_normal_only = (condim == 1)[:, None]              # (C, 1)
    nrows = jnp.where(condim == 1, 1, 2 * (condim - 1))  # (C,)
    row_live = (jnp.arange(6)[None, :] < nrows[:, None]) \
        & con.active[:, None]

    actc = con.active.astype(dtype)[:, None]             # (C, 1)
    dlive = ((jnp.arange(3)[None, :] < condim[:, None] - 1)
             & con.active[:, None]).astype(dtype)        # (C, 3)
    Jdir = jnp.stack([Jt1, Jt2, Jtor], axis=1)           # (C, 3, nv)
    Jd_scaled = Jdir * (mu[:, 0:3] * dlive)[..., None]
    Jbase = jnp.concatenate(
        [(Jn * actc)[:, None, :], Jd_scaled], axis=1).reshape(-1, nv)

    # Facet aref from the 4 base velocity products (identical values to
    # the dense form on live slots; dead slots are masked anyway).
    vn = Jn @ qvel                                       # (C,)
    vd = jnp.sum(Jd_scaled * qvel, axis=-1)              # (C, 3)
    vplus = vn[:, None] + vd
    vminus = vn[:, None] - vd
    vel = jnp.stack([vplus[:, 0], vminus[:, 0], vplus[:, 1],
                     vminus[:, 1], vplus[:, 2], vminus[:, 2]], axis=-1)
    aref_c = -b[:, None] * vel - (k * imp * pos_m)[:, None]
    diag = jnp.where(is_normal_only, diag_n[:, None], diag_pyr[:, None])
    R_c = jnp.broadcast_to(
        jnp.maximum(MINVAL, ((1 - imp) / imp)[:, None] * diag),
        (ncmax, 6))
    livef = row_live.astype(dtype)
    arefs.append((aref_c * livef).reshape(-1))
    Rs.append(R_c.reshape(-1))
    fls.append(jnp.zeros(ncmax * 6, dtype=dtype))
    actives.append(row_live.reshape(-1))
    onesides.append(jnp.ones(ncmax * 6, dtype=bool))
    poss.append(jnp.broadcast_to(con.dist[:, None], (ncmax, 6)).reshape(-1))

    J = (jnp.concatenate(Js, axis=0) if Js
         else jnp.zeros((0, nv), dtype=dtype))           # non-contact rows
    aref = jnp.concatenate(arefs)
    R = jnp.concatenate(Rs)
    floss = jnp.concatenate(fls)
    active = jnp.concatenate(actives)
    oneside = jnp.concatenate(onesides)
    pos = jnp.concatenate(poss)
    D = jnp.where(active, 1.0 / R, 0.0)
    # Inactive rows were neutralized piecewise above (fric rows are always
    # active; limit/tendon/contact pieces are multiplied by their masks).
    rows = Rows(J=J, aref=aref, D=D, R=R, floss=floss, active=active,
                oneside=oneside, pos=pos, Jbase=Jbase)
    # MJE_JBASE=1 keeps the base-compressed storage through the solver.
    # Default: expand to the dense facet layout at build time — measured
    # on v5e (512-chunk rollout @4096): dense 31.0k env-steps/s vs
    # compressed 28.2k.  The 6->4 row byte cut helps only when J passes
    # are bandwidth-bound (large unchunked batches); in the chunked
    # production regime the expand/collapse's extra small ops cost more
    # per Newton iteration than the saved bytes.
    import os
    if os.environ.get("MJE_JBASE", "0") != "1":
        rows = rows._replace(J=expand_J(rows), Jbase=None)
    return rows


def _make_rows_ref(m: Model, kin: Kin, qpos: jnp.ndarray, qvel: jnp.ndarray,
              con: CompactContacts) -> Rows:
    s = m.spec
    dtype = qpos.dtype
    nv = s.nv

    Js, arefs, Ds, Rs, fls, actives, onesides, poss = \
        [], [], [], [], [], [], [], []

    # ---- dof friction rows (always active) -------------------------------
    fr_dofs = np.nonzero(s.dof_hasfrictionloss)[0]
    if len(fr_dofs):
        Jf = jnp.zeros((len(fr_dofs), nv), dtype=dtype)
        Jf = Jf.at[jnp.arange(len(fr_dofs)), fr_dofs].set(1.0)
        imp = _impedance(m.dof_solimp_fri[fr_dofs], jnp.zeros(
            len(fr_dofs), dtype=dtype))
        k, b = _kb(m.dof_solref_fri[fr_dofs], m.dof_solimp_fri[fr_dofs])
        aref = -b * qvel[fr_dofs]
        R = jnp.maximum(MINVAL,
                        (1 - imp) / imp * m.dof_invweight0[fr_dofs])
        Js.append(Jf)
        arefs.append(aref)
        Rs.append(R)
        fls.append(m.dof_frictionloss[fr_dofs])
        actives.append(jnp.ones(len(fr_dofs), dtype=bool))
        onesides.append(jnp.zeros(len(fr_dofs), dtype=bool))
        poss.append(jnp.zeros(len(fr_dofs), dtype=dtype))

    # ---- joint limit rows -------------------------------------------------
    lim_jnts = np.nonzero(s.jnt_limited)[0]
    if len(lim_jnts):
        q = qpos[lim_jnts]
        lo = m.jnt_range[lim_jnts, 0]
        hi = m.jnt_range[lim_jnts, 1]
        dist_lo = q - lo
        dist_hi = hi - q
        lower = dist_lo < dist_hi
        dist = jnp.where(lower, dist_lo, dist_hi)
        sgn = jnp.where(lower, 1.0, -1.0)
        margin = m.jnt_margin[lim_jnts]
        act = dist < margin
        Jl = jnp.zeros((len(lim_jnts), nv), dtype=dtype)
        Jl = Jl.at[jnp.arange(len(lim_jnts)), lim_jnts].set(sgn)
        imp = _impedance(m.jnt_solimp_lim[lim_jnts], dist - margin)
        k, b = _kb(m.jnt_solref_lim[lim_jnts], m.jnt_solimp_lim[lim_jnts])
        aref = -b * (sgn * qvel[lim_jnts]) - k * imp * (dist - margin)
        R = jnp.maximum(MINVAL,
                        (1 - imp) / imp * m.dof_invweight0[lim_jnts])
        Js.append(Jl)
        arefs.append(aref)
        Rs.append(R)
        fls.append(jnp.zeros(len(lim_jnts), dtype=dtype))
        actives.append(act)
        onesides.append(jnp.ones(len(lim_jnts), dtype=bool))
        poss.append(dist)

    # ---- tendon limit rows -------------------------------------------------
    lim_tens = np.nonzero(s.ten_limited)[0]
    if len(lim_tens):
        W = m.ten_coef[lim_tens]                 # (T, nv)
        length = W @ qpos
        lo = m.ten_range[lim_tens, 0]
        hi = m.ten_range[lim_tens, 1]
        dist_lo = length - lo
        dist_hi = hi - length
        lower = dist_lo < dist_hi
        dist = jnp.where(lower, dist_lo, dist_hi)
        sgn = jnp.where(lower, 1.0, -1.0)
        margin = m.ten_margin[lim_tens]
        act = dist < margin
        Jt = sgn[:, None] * W
        imp = _impedance(m.ten_solimp_lim[lim_tens], dist - margin)
        k, b = _kb(m.ten_solref_lim[lim_tens], m.ten_solimp_lim[lim_tens])
        aref = -b * (Jt @ qvel) - k * imp * (dist - margin)
        R = jnp.maximum(MINVAL,
                        (1 - imp) / imp * m.ten_invweight0[lim_tens])
        Js.append(Jt)
        arefs.append(aref)
        Rs.append(R)
        fls.append(jnp.zeros(len(lim_tens), dtype=dtype))
        actives.append(act)
        onesides.append(jnp.ones(len(lim_tens), dtype=bool))
        poss.append(dist)

    # ---- contact rows (ncmax x 6 facet slots) ------------------------------
    ncmax = con.dist.shape[0]
    b1 = jnp.asarray(s.geom_bodyid)[con.geom1]
    b2 = jnp.asarray(s.geom_bodyid)[con.geom2]
    jac1p, jac1r = point_jacobian(m, kin, con.pos, b1)   # (C, 3, nv)
    jac2p, jac2r = point_jacobian(m, kin, con.pos, b2)
    djp = jac2p - jac1p
    djr = jac2r - jac1r
    n = con.frame[:, 0]
    t1 = con.frame[:, 1]
    t2 = con.frame[:, 2]
    Jn = jnp.einsum("ck,ckv->cv", n, djp)                # (C, nv)
    Jt1 = jnp.einsum("ck,ckv->cv", t1, djp)
    Jt2 = jnp.einsum("ck,ckv->cv", t2, djp)
    Jtor = jnp.einsum("ck,ckv->cv", n, djr)

    mu = m.pair_friction[con.pairid]                     # (C, 5)
    margin = m.pair_margin[con.pairid]
    gap = m.pair_gap[con.pairid]
    incmargin = margin - gap
    solref = m.pair_solref[con.pairid]
    solimp = m.pair_solimp[con.pairid]
    pos_m = con.dist - incmargin
    imp = _impedance(solimp, pos_m)                      # (C,)
    k, b = _kb(solref, solimp)

    invw = (m.body_invweight0[b1, 0] + m.body_invweight0[b2, 0])
    mu1 = mu[:, 0]
    # mj_diagApprox, determined empirically against the oracle across
    # mu in {0.1..3} and condim in {1,3,4}: pyramidal rows use
    # 2*max(2, mu^2*(1+mu^2)) * (trans invweight sum); frictionless
    # condim=1 rows use the plain invweight sum (verified via explicit
    # <pair condim=1> — a geom-level condim=1 is silently promoted to 3
    # by mj_contactParam when the partner geom has condim 3, which is
    # why only pair-level probes expose this).  impratio=1 throughout
    # this suite; division kept for parameter parity.
    diag_pyr = 2.0 * jnp.maximum(2.0, mu1 * mu1 * (1.0 + mu1 * mu1)) \
        * invw / s.impratio
    diag_n = invw
    condim = con.condim

    # facet slots: 0,1 = +-t1 ; 2,3 = +-t2 ; 4,5 = +-torsion.
    # condim 1 uses slot 0 as the pure normal row.
    facet_dir = jnp.stack([Jt1, Jt1, Jt2, Jt2, Jtor, Jtor], axis=1)
    facet_mu = jnp.stack([mu[:, 0], mu[:, 0], mu[:, 1], mu[:, 1],
                          mu[:, 2], mu[:, 2]], axis=1)
    facet_sgn = jnp.asarray([1.0, -1.0, 1.0, -1.0, 1.0, -1.0],
                            dtype=dtype)
    is_normal_only = (condim == 1)[:, None]              # (C, 1)
    Jc = Jn[:, None, :] + jnp.where(
        is_normal_only[..., None], 0.0,
        facet_sgn[None, :, None] * facet_mu[..., None] * facet_dir)
    nrows = jnp.where(condim == 1, 1, 2 * (condim - 1))  # (C,)
    row_live = (jnp.arange(6)[None, :] < nrows[:, None]) \
        & con.active[:, None]

    vel = jnp.einsum("crv,v->cr", Jc, qvel)
    aref_c = -b[:, None] * vel - (k * imp * pos_m)[:, None]
    diag = jnp.where(is_normal_only, diag_n[:, None], diag_pyr[:, None])
    R_c = jnp.broadcast_to(
        jnp.maximum(MINVAL, ((1 - imp) / imp)[:, None] * diag),
        (ncmax, 6))
    aref_c = jnp.broadcast_to(aref_c, (ncmax, 6))

    Js.append(Jc.reshape(-1, nv))
    arefs.append(aref_c.reshape(-1))
    Rs.append(R_c.reshape(-1))
    fls.append(jnp.zeros(ncmax * 6, dtype=dtype))
    actives.append(row_live.reshape(-1))
    onesides.append(jnp.ones(ncmax * 6, dtype=bool))
    poss.append(jnp.broadcast_to(con.dist[:, None], (ncmax, 6)).reshape(-1))

    J = jnp.concatenate(Js, axis=0)
    aref = jnp.concatenate(arefs)
    R = jnp.concatenate(Rs)
    floss = jnp.concatenate(fls)
    active = jnp.concatenate(actives)
    oneside = jnp.concatenate(onesides)
    pos = jnp.concatenate(poss)
    D = jnp.where(active, 1.0 / R, 0.0)
    # Inactive rows are fully neutralized.
    J = jnp.where(active[:, None], J, 0.0)
    aref = jnp.where(active, aref, 0.0)
    return Rows(J=J, aref=aref, D=D, R=R, floss=floss, active=active,
                oneside=oneside, pos=pos)
