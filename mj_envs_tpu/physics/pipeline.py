"""Forward dynamics pipeline and semi-implicit Euler integration.

`step(model, data, ctrl)` reproduces mj_step semantics for this suite:
forward dynamics at the current state (kinematics -> tendons/actuation ->
smooth forces -> collision -> constraints -> Newton solve), then Euler
integration with implicit joint damping.  The returned Data carries the
post-step (qpos, qvel) but the *pre-step* kinematic caches, exactly like
MjData after mj_step — task observations/rewards read those caches, which
is the reference's observable behavior through mujoco-py
(`mj_envs_vision/hand_manipulation_suite/hammer_v0.py:54-104`).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from . import actuation as A
from . import dynamics as D
from . import kinematics as K
from .collision import driver as C
from . import constraint as CN
from . import solver as S
from .model import Model, Data


class ForwardOut(NamedTuple):
    kin: K.Kin
    M: jnp.ndarray
    qfrc_bias: jnp.ndarray
    qfrc_passive: jnp.ndarray
    act: A.Actuation
    qacc_smooth: jnp.ndarray
    contact_full: object
    contacts: C.CompactContacts
    rows: CN.Rows
    solve: S.SolveResult
    qacc: jnp.ndarray
    sensordata: jnp.ndarray
    contacts_clipped: jnp.ndarray  # () bool — narrowphase found more
                                   #  in-margin contacts than the ncmax
                                   #  active slots; compact() dropped the
                                   #  overflow (ADVICE r1 / VERDICT r2 #8)


def _ncmax(spec) -> int:
    """Active-contact slot budget for the solver.  The suite's scenes
    peak at ~10 simultaneous contacts (oracle traces; in-hand grasps
    included) — 32 gives ample headroom at half the constraint-row cost
    of the old 64."""
    return getattr(spec, "ncon_active_cap", None) or min(spec.ncon_cap, 32)


def forward_core(m: Model, qpos, qvel, ctrl, qacc_warmstart,
                 qfrc_applied) -> ForwardOut:
    s = m.spec
    kin = K.kinematics(m, qpos)
    M = D.crb(m, kin)
    vel = D.com_velocity(m, kin, qvel)
    qfrc_bias = D.bias_force(m, kin, vel, qvel)
    qfrc_passive = D.passive_force(m, qpos, qvel)
    act = A.actuation(m, qpos, qvel, ctrl)

    qfrc_smooth = act.qfrc_actuator + qfrc_passive + qfrc_applied \
        - qfrc_bias
    from .kernels import chol_solve, chol_solve_factor
    if qpos.dtype == jnp.float32 and s.noslip_iterations > 0:
        # Keep the factor of M for reuse in noslip's matrix-RHS solve.
        qacc_smooth, M_fac = chol_solve_factor(M, qfrc_smooth)
    else:
        # f64 oracle-parity path: ops verbatim (no extra factor output).
        # Also the f32 path when there is no noslip pass: the factor
        # would never be reused, and materializing it costs an extra
        # nv^2*B HBM round-trip (ADVICE r4 item 4).
        qacc_smooth = chol_solve(M, qfrc_smooth)
        M_fac = None

    contact_full, contacts = C.collide(m, kin, _ncmax(s))
    rows = CN.make_rows(m, kin, qpos, qvel, contacts)
    solve = S.newton_solve(M, qacc_smooth, rows, qacc_warmstart,
                           iterations=s.iterations)
    if s.noslip_iterations > 0:
        import numpy as np
        nfl = int(np.sum(s.dof_hasfrictionloss))
        solve = S.noslip(M, rows, solve, nfl, _ncmax(s),
                         s.noslip_iterations, M_fac=M_fac)

    sensordata = _sensors(m, kin, qpos, act, contacts, rows, solve)
    clipped = jnp.sum(contact_full.active) > _ncmax(s)
    return ForwardOut(kin=kin, M=M, qfrc_bias=qfrc_bias,
                      qfrc_passive=qfrc_passive, act=act,
                      qacc_smooth=qacc_smooth, contact_full=contact_full,
                      contacts=contacts, rows=rows, solve=solve,
                      qacc=solve.qacc, sensordata=sensordata,
                      contacts_clipped=clipped)


def _sensors(m: Model, kin: K.Kin, qpos, act: A.Actuation,
             contacts: C.CompactContacts, rows: CN.Rows,
             solve: S.SolveResult) -> jnp.ndarray:
    """jointpos / actuatorfrc / touch sensors (the suite's full set),
    fully vectorized (static index arrays, batched geometry tests)."""
    import numpy as np
    s = m.spec
    dtype = qpos.dtype
    out = jnp.zeros((s.nsensordata,), dtype=dtype)

    jp = [(obj, adr) for st, obj, adr, _ in s.sensors if st == "jointpos"]
    af = [(obj, adr) for st, obj, adr, _ in s.sensors
          if st == "actuatorfrc"]
    th = [(obj, adr) for st, obj, adr, _ in s.sensors if st == "touch"]

    if jp:
        objs = np.array([o for o, _ in jp])
        adrs = np.array([a for _, a in jp])
        out = out.at[adrs].set(qpos[objs])
    if af:
        objs = np.array([o for o, _ in af])
        adrs = np.array([a for _, a in af])
        out = out.at[adrs].set(act.actuator_force[objs])
    if th:
        sids = np.array([o for o, _ in th])
        adrs = np.array([a for _, a in th])
        # Per compacted contact: total normal force = sum of facet forces
        # (each pyramid facet contributes 1x the normal direction).
        ncmax = contacts.dist.shape[0]
        con_forces = solve.efc_force[-ncmax * 6:].reshape(ncmax, 6)
        normal_force = jnp.sum(con_forces, axis=1)       # (C,)
        b1 = jnp.asarray(s.geom_bodyid)[contacts.geom1]
        b2 = jnp.asarray(s.geom_bodyid)[contacts.geom2]

        # (S, C, 3): contact positions in each touch site's frame.
        # f32: broadcast-multiply-sum instead of einsum — batched 3-wide
        # dot_generals pad to the MXU (~0.9 ms/substep at 4096 envs).
        # f64 keeps the historical einsum for oracle-parity bits.
        diff = contacts.pos[None, :, :] \
            - kin.site_xpos[sids][:, None, :]              # (S, C, 3=j)
        if dtype == jnp.float64:
            rel = jnp.einsum("sji,scj->sci", kin.site_xmat[sids], diff)
        else:
            rel = jnp.sum(kin.site_xmat[sids][:, None, :, :]
                          * diff[..., :, None], axis=-2)   # sum over j
        size = m.site_size[sids][:, None, :]             # (S, 1, 3)
        stype = np.asarray(s.site_type[sids])            # (S,) static
        in_sphere = jnp.sum(rel * rel, axis=-1) <= size[..., 0] ** 2
        in_cyl = (jnp.abs(rel[..., 2]) <= size[..., 1]) & (
            rel[..., 0] ** 2 + rel[..., 1] ** 2 <= size[..., 0] ** 2)
        zc = jnp.clip(rel[..., 2], -size[..., 1], size[..., 1])
        in_cap = (rel[..., 0] ** 2 + rel[..., 1] ** 2
                  + (rel[..., 2] - zc) ** 2) <= size[..., 0] ** 2
        in_box = jnp.all(jnp.abs(rel) <= size, axis=-1)
        type_sel = jnp.asarray(stype)[:, None]
        inside = jnp.where(
            type_sel == 2, in_sphere,
            jnp.where(type_sel == 5, in_cyl,
                      jnp.where(type_sel == 3, in_cap, in_box)))
        bodies = jnp.asarray(s.site_bodyid[sids])[:, None]  # (S, 1)
        involves = (b1[None, :] == bodies) | (b2[None, :] == bodies)
        vals = jnp.sum(jnp.where(
            inside & involves & contacts.active[None, :],
            normal_force[None, :], 0.0), axis=1)
        out = out.at[adrs].set(vals)
    return out


def forward(m: Model, d: Data) -> Data:
    """Recompute all caches at (qpos, qvel, ctrl) — mj_forward."""
    out = forward_core(m, d.qpos, d.qvel, d.ctrl, d.qacc_warmstart,
                       d.qfrc_applied)
    return _write_caches(m, d, out).replace(qacc=out.qacc)


def forward_light(m: Model, d: Data) -> Data:
    """Reset-path forward: kinematic caches + the obs-relevant sensors,
    WITHOUT collision or the constraint solve.

    `env.reset` only needs pose caches and sensor values for the first
    observation; at a fresh (qpos0, qvel=0) state contact forces are not
    observable through any task obs (the only obs-visible touch sensor is
    hammer's S_nail, untouched at reset), so the full pipeline — which
    step_auto_reset would otherwise pay EVERY vectorized step — is
    skipped.  Leaving qacc_warmstart at zero also matches the reference
    more closely: mujoco's mj_forward does not update qacc_warmstart, so
    after the reference's reset_model() the next step starts from a zero
    warmstart (`mjrl mujoco_env` reset; mj_resetData zeroes it)."""
    import numpy as np
    s = m.spec
    kin = K.kinematics(m, d.qpos)
    act = A.actuation(m, d.qpos, d.qvel, d.ctrl)
    sensordata = jnp.zeros((s.nsensordata,), dtype=d.qpos.dtype)
    jp = [(obj, adr) for st, obj, adr, _ in s.sensors if st == "jointpos"]
    af = [(obj, adr) for st, obj, adr, _ in s.sensors
          if st == "actuatorfrc"]
    if jp:
        objs = np.array([o for o, _ in jp])
        adrs = np.array([a for _, a in jp])
        sensordata = sensordata.at[adrs].set(d.qpos[objs])
    if af:
        objs = np.array([o for o, _ in af])
        adrs = np.array([a for _, a in af])
        sensordata = sensordata.at[adrs].set(act.actuator_force[objs])
    return d.replace(
        xpos=kin.xpos, xquat=kin.xquat, xipos=kin.xipos,
        geom_xpos=kin.geom_xpos, geom_xmat=kin.geom_xmat,
        site_xpos=kin.site_xpos, site_xmat=kin.site_xmat,
        subtree_com=kin.subtree_com,
        ten_length=act.ten_length,
        actuator_force=act.actuator_force,
        sensordata=sensordata,
    )


def _write_caches(m: Model, d: Data, out: ForwardOut) -> Data:
    kin = out.kin
    return d.replace(
        xpos=kin.xpos, xquat=kin.xquat, xipos=kin.xipos,
        geom_xpos=kin.geom_xpos, geom_xmat=kin.geom_xmat,
        site_xpos=kin.site_xpos, site_xmat=kin.site_xmat,
        subtree_com=kin.subtree_com,
        ten_length=out.act.ten_length,
        actuator_force=out.act.actuator_force,
        sensordata=out.sensordata,
        efc_force=jnp.zeros_like(d.efc_force).at[
            :out.solve.efc_force.shape[0]].set(out.solve.efc_force),
        ncon_active=jnp.sum(out.contact_full.active).astype(jnp.int32),
    )


def step(m: Model, d: Data, ctrl: jnp.ndarray) -> Data:
    """mj_step: forward dynamics then Euler with implicit joint damping."""
    s = m.spec
    h = jnp.asarray(s.timestep, dtype=d.qpos.dtype)
    out = forward_core(m, d.qpos, d.qvel, ctrl, d.qacc_warmstart,
                       d.qfrc_applied)

    # Implicit joint damping (mj_Euler): (M + h diag(B)) qacc' = total
    # force, where the passive force already contains -B qvel.
    qfrc_total = out.M @ out.qacc
    MhB = out.M + h * jnp.diag(m.dof_damping)
    from .kernels import chol_solve
    qacc_imp = chol_solve(MhB, qfrc_total)

    qvel_new = d.qvel + h * qacc_imp
    qpos_new = d.qpos + h * qvel_new

    d = _write_caches(m, d, out)
    return d.replace(
        qpos=qpos_new, qvel=qvel_new, ctrl=ctrl,
        qacc=out.qacc, qacc_warmstart=out.solve.qacc,
        time=d.time + h,
    )
