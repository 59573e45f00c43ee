"""Forward kinematics and com-frame quantities.

The tree recursion is unrolled over bodies at trace time (nbody <= ~33 in
this suite); every per-body op is batched over envs under vmap.  All
path/subtree reductions are einsums against static masks — no scans, no
dynamic shapes, so XLA maps them onto large fused VPU/MXU ops.

Spatial quantities live in each kinematic tree's "com frame": world axes,
origin at the subtree com of the tree root (same formulation mujoco uses for
cdof/cinert, reference behavior accessed via `sim.data` in
`mj_envs_vision/hand_manipulation_suite/*_v0.py`).
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from . import maths
from .model import Model, JNT_HINGE, JNT_SLIDE


class Kin(NamedTuple):  # noqa: D101

    xpos: jnp.ndarray        # (nbody, 3)
    xquat: jnp.ndarray       # (nbody, 4)
    xmat: jnp.ndarray        # (nbody, 3, 3)
    xipos: jnp.ndarray       # (nbody, 3)
    geom_xpos: jnp.ndarray   # (ngeom, 3)
    geom_xmat: jnp.ndarray   # (ngeom, 3, 3)
    site_xpos: jnp.ndarray   # (nsite, 3)
    site_xmat: jnp.ndarray   # (nsite, 3, 3)
    xanchor: jnp.ndarray     # (njnt, 3)
    xaxis: jnp.ndarray       # (njnt, 3)
    subtree_com: jnp.ndarray  # (nbody, 3) com of subtree rooted at body
    root_com: jnp.ndarray    # (nbody, 3) com frame origin for body's tree
    cdof: jnp.ndarray        # (nv, 6) [angular; linear] per dof
    cinert: jnp.ndarray      # (nbody, 6, 6) spatial inertia in com frame


def _kinematics_ref(m: Model, qpos: jnp.ndarray) -> Kin:
    s = m.spec
    dtype = qpos.dtype

    xpos = [None] * s.nbody
    xquat = [None] * s.nbody
    xanchor = [None] * s.njnt
    xaxis = [None] * s.njnt

    xpos[0] = jnp.zeros(3, dtype=dtype)
    xquat[0] = jnp.array([1.0, 0, 0, 0], dtype=dtype)

    # Joints per body, in dof order (static python structure).
    jnts_of = [[] for _ in range(s.nbody)]
    for j in range(s.njnt):
        jnts_of[int(s.jnt_bodyid[j])].append(j)

    for b in range(1, s.nbody):
        p = int(s.body_parentid[b])
        # Parent frame composed with the fixed body offset.
        pq = maths.quat_mul(xquat[p], m.body_quat[b])
        pp = xpos[p] + maths.quat_rot(xquat[p], m.body_pos[b])
        # Apply the body's joints in order (all 1-dof hinge/slide).
        for j in jnts_of[b]:
            q_j = qpos[j]
            axis_l = m.jnt_axis[j]
            if int(s.jnt_type[j]) == JNT_SLIDE:
                pp = pp + maths.quat_rot(pq, axis_l * q_j)
            else:  # hinge: rotate about the anchor jnt_pos
                qrot = maths.axis_angle_to_quat(axis_l, q_j)
                anchor_w = pp + maths.quat_rot(pq, m.jnt_pos[j])
                pq = maths.quat_mul(pq, qrot)
                pq = maths.quat_normalize(pq)
                pp = anchor_w - maths.quat_rot(pq, m.jnt_pos[j])
            xanchor[j] = pp + maths.quat_rot(pq, m.jnt_pos[j])
            xaxis[j] = maths.quat_rot(pq, axis_l)
        xpos[b] = pp
        xquat[b] = pq

    xpos = jnp.stack(xpos)
    xquat = jnp.stack(xquat)
    xmat = maths.quat_to_mat(xquat)
    xanchor = (jnp.stack(xanchor) if s.njnt
               else jnp.zeros((0, 3), dtype=dtype))
    xaxis = (jnp.stack(xaxis) if s.njnt
             else jnp.zeros((0, 3), dtype=dtype))

    xipos = xpos + maths.quat_rot(xquat, m.body_ipos)
    ximat = maths.quat_to_mat(maths.quat_mul(xquat, m.body_iquat))

    # Geoms / sites.
    gb = s.geom_bodyid
    geom_xpos = xpos[gb] + maths.quat_rot(xquat[gb], m.geom_pos)
    geom_xmat = maths.quat_to_mat(maths.quat_mul(xquat[gb], m.geom_quat))
    sb = s.site_bodyid
    site_xpos = xpos[sb] + maths.quat_rot(xquat[sb], m.site_pos)
    site_xmat = maths.quat_to_mat(maths.quat_mul(xquat[sb], m.site_quat))

    # Subtree com (mass-weighted over static subtree masks).
    subtree_mask = jnp.asarray(s.subtree_mask, dtype=dtype)  # (nbody, nbody)
    mass = m.body_mass
    wsum = subtree_mask @ mass                           # (nbody,)
    wpos = jnp.einsum("bd,d,dk->bk", subtree_mask, mass, xipos)
    subtree_com = wpos / jnp.maximum(wsum, 1e-12)[..., None]
    root_com = subtree_com[s.body_rootid]

    # cdof: spatial motion axis per dof at the tree-root com.
    jb = s.jnt_bodyid
    offset = root_com[jb] - xanchor                      # c - a
    is_hinge = jnp.asarray(s.jnt_type == JNT_HINGE)[:, None]
    ang = jnp.where(is_hinge, xaxis, 0.0)
    lin = jnp.where(is_hinge, jnp.cross(xaxis, offset), xaxis)
    cdof = jnp.concatenate([ang, lin], axis=-1)

    # Spatial inertia per body at its tree-root com, world axes.
    # f32: broadcast-multiply-sum, not einsum — batched 3x3 dot_generals
    # pad to the 128-wide MXU and were ~1.4 ms/substep at 4096 envs
    # (round-4 trace); the elementwise form fuses on the VPU.  f64 keeps
    # the historical einsum so the oracle-parity bits are unchanged
    # (reduction order differs between the two forms).
    if dtype == jnp.float64:
        inert_world = jnp.einsum(
            "bij,bj,bkj->bik", ximat, m.body_inertia, ximat)
    else:
        tmp = ximat * m.body_inertia[..., None, :]         # R diag(I)
        inert_world = jnp.sum(
            tmp[..., :, None, :] * ximat[..., None, :, :], axis=-1)
    cinert = maths.spatial_inertia(mass, inert_world, xipos - root_com)

    return Kin(xpos=xpos, xquat=xquat, xmat=xmat, xipos=xipos,
               geom_xpos=geom_xpos, geom_xmat=geom_xmat,
               site_xpos=site_xpos, site_xmat=site_xmat,
               xanchor=xanchor, xaxis=xaxis,
               subtree_com=subtree_com, root_com=root_com,
               cdof=cdof, cinert=cinert)


# ---------------------------------------------------------------------------
# Level-parallel FK (f32 batched path)
# ---------------------------------------------------------------------------

_FK_PAR_STATIC: dict = {}


def _fk_parallel_static(s):
    """Static tables for the pointer-doubling FK: per-body joint slots,
    per-joint (body, slot) coordinates, and 2^k-ancestor tables."""
    import numpy as np
    key = id(s)
    if key in _FK_PAR_STATIC:
        return _FK_PAR_STATIC[key]
    parent = np.asarray(s.body_parentid, dtype=np.int32).copy()
    nbody, njnt = int(s.nbody), int(s.njnt)
    jnts_of = [[] for _ in range(nbody)]
    for j in range(njnt):
        jnts_of[int(s.jnt_bodyid[j])].append(j)
    maxj = max((len(x) for x in jnts_of), default=0)
    jslot = np.full((nbody, max(1, maxj)), njnt, dtype=np.int32)
    for b, js in enumerate(jnts_of):
        for t, j in enumerate(js):
            jslot[b, t] = j
    body_of_jnt = np.asarray(s.jnt_bodyid, dtype=np.int32)
    slot_of_jnt = np.zeros(njnt, dtype=np.int32)
    for b, js in enumerate(jnts_of):
        for t, j in enumerate(js):
            slot_of_jnt[j] = t
    depth = np.zeros(nbody, dtype=np.int64)
    for b in range(1, nbody):
        depth[b] = depth[parent[b]] + 1
    max_depth = int(depth.max()) if nbody > 1 else 1
    rounds = 0
    while (1 << rounds) < max_depth:
        rounds += 1
    anc = []
    a = parent.copy()
    a[0] = 0
    for _ in range(rounds):
        anc.append(a.copy())
        a = a[a]
    out = (parent, jslot, maxj, body_of_jnt, slot_of_jnt, tuple(anc))
    _FK_PAR_STATIC[key] = out
    return out


def _kinematics_parallel(m: Model, qpos: jnp.ndarray) -> Kin:
    """Forward kinematics with a LOG-DEPTH dependency graph.

    Re-associates the sequential tree chain: (a) per-joint LOCAL
    transforms, computed for all joints at once; (b) in-body joint
    chains folded in `maxj` masked rounds; (c) the body tree composed
    by pointer doubling over static 2^k-ancestor tables (log2(depth)
    ~ 4 rounds for the Adroit scenes).  Total ~10 dependent stages of
    fully batched ops.

    NOT the TPU default: on v5e its batched take-gathers lower poorly
    (10.9 ms @4096 vs the Pallas kernel's 0.29 ms); it exists as a
    portable, dependency-shallow alternative (useful on backends
    without Mosaic, and as an equivalence oracle).

    Numerics: identical formulas, different association (plus one final
    quaternion normalization instead of per-hinge) -> f32-roundoff
    differences vs `_kinematics_ref`; gated by
    tests/test_kernels.py::test_fk_parallel_matches_ref.  The f64
    oracle-parity path NEVER enters here (kinematics() unbatched is the
    reference, verbatim).
    """
    s = m.spec
    dtype = qpos.dtype
    parent, jslot, maxj, body_of_jnt, slot_of_jnt, anc = \
        _fk_parallel_static(s)
    njnt = s.njnt

    # ---- (a) per-joint local transforms (parent-frame -> after-joint) ----
    qj = qpos[jnp.asarray(s.jnt_qposadr)]                   # (njnt,)
    axis = m.jnt_axis                                       # (njnt, 3)
    jp = m.jnt_pos
    is_slide = jnp.asarray(s.jnt_type == JNT_SLIDE)[:, None]
    rq = maths.axis_angle_to_quat(axis, qj)                 # (njnt, 4)
    ident_q = jnp.concatenate(
        [jnp.ones((njnt, 1), dtype), jnp.zeros((njnt, 3), dtype)], axis=-1)
    # hinge about anchor jnt_pos: p = jp - R(rq) jp ; slide: p = axis*q.
    Jq = jnp.where(is_slide, ident_q, rq)
    Jp = jnp.where(is_slide, axis * qj[:, None],
                   jp - maths.quat_rot(rq, jp))
    # sentinel identity row for empty joint slots
    Jq = jnp.concatenate([Jq, ident_q[:1]], axis=0)         # (njnt+1, 4)
    Jp = jnp.concatenate([Jp, jnp.zeros((1, 3), dtype)], axis=0)

    # ---- (b) in-body chains: L_b = offset_b . J_1 . ... . J_k ----------
    Lq = m.body_quat                                        # (nbody, 4)
    Lp = m.body_pos
    round_q, round_p = [], []
    for t in range(maxj):
        idx = jslot[:, t]                                   # static np
        jq_t = Jq[jnp.asarray(idx)]
        jp_t = Jp[jnp.asarray(idx)]
        newq = maths.quat_mul(Lq, jq_t)
        newp = Lp + maths.quat_rot(Lq, jp_t)
        round_q.append(newq)
        round_p.append(newp)
        has = jnp.asarray((idx < njnt)[:, None])
        Lq = jnp.where(has, newq, Lq)
        Lp = jnp.where(has, newp, Lp)

    # per-joint within-body prefix A_j (incl. joint j), by static gather
    if njnt:
        rq_all = jnp.stack(round_q)                         # (maxj, nbody, 4)
        rp_all = jnp.stack(round_p)
        Aq = rq_all[jnp.asarray(slot_of_jnt), jnp.asarray(body_of_jnt)]
        Ap = rp_all[jnp.asarray(slot_of_jnt), jnp.asarray(body_of_jnt)]

    # ---- (c) tree prefix composition by pointer doubling ----------------
    Gq, Gp = Lq, Lp                 # world body: identity offset, no joints
    for a in anc:
        aj = jnp.asarray(a)
        pq = Gq[aj]
        pp = Gp[aj]
        Gq = maths.quat_mul(pq, Gq)
        Gp = pp + maths.quat_rot(pq, Gp)
    xquat = maths.quat_normalize(Gq)
    xpos = Gp

    # ---- joint anchors / axes in world ----------------------------------
    if njnt:
        pb = jnp.asarray(parent[body_of_jnt])               # static
        Wq = xquat[pb]
        Wp = xpos[pb]
        WAq = maths.quat_normalize(maths.quat_mul(Wq, Aq))
        WAp = Wp + maths.quat_rot(Wq, Ap)
        xanchor = WAp + maths.quat_rot(WAq, jp)
        xaxis = maths.quat_rot(WAq, axis)
    else:
        xanchor = jnp.zeros((0, 3), dtype=dtype)
        xaxis = jnp.zeros((0, 3), dtype=dtype)

    # ---- epilogue: identical (f32) formulas to _kinematics_ref ----------
    xipos = xpos + maths.quat_rot(xquat, m.body_ipos)
    ximat = maths.quat_to_mat(maths.quat_mul(xquat, m.body_iquat))

    gb = s.geom_bodyid
    geom_xpos = xpos[gb] + maths.quat_rot(xquat[gb], m.geom_pos)
    geom_xmat = maths.quat_to_mat(maths.quat_mul(xquat[gb], m.geom_quat))
    sb = s.site_bodyid
    site_xpos = xpos[sb] + maths.quat_rot(xquat[sb], m.site_pos)
    site_xmat = maths.quat_to_mat(maths.quat_mul(xquat[sb], m.site_quat))
    xmat = maths.quat_to_mat(xquat)

    subtree_mask = jnp.asarray(s.subtree_mask, dtype=dtype)
    mass = m.body_mass
    wsum = subtree_mask @ mass
    wpos = jnp.einsum("bd,d,dk->bk", subtree_mask, mass, xipos)
    subtree_com = wpos / jnp.maximum(wsum, 1e-12)[..., None]
    root_com = subtree_com[s.body_rootid]

    jb = s.jnt_bodyid
    offset = root_com[jb] - xanchor
    is_hinge = jnp.asarray(s.jnt_type == JNT_HINGE)[:, None]
    ang = jnp.where(is_hinge, xaxis, 0.0)
    lin = jnp.where(is_hinge, jnp.cross(xaxis, offset), xaxis)
    cdof = jnp.concatenate([ang, lin], axis=-1)

    tmp = ximat * m.body_inertia[..., None, :]
    inert_world = jnp.sum(
        tmp[..., :, None, :] * ximat[..., None, :, :], axis=-1)
    cinert = maths.spatial_inertia(mass, inert_world, xipos - root_com)

    return Kin(xpos=xpos, xquat=xquat, xmat=xmat, xipos=xipos,
               geom_xpos=geom_xpos, geom_xmat=geom_xmat,
               site_xpos=site_xpos, site_xmat=site_xmat,
               xanchor=xanchor, xaxis=xaxis,
               subtree_com=subtree_com, root_com=root_com,
               cdof=cdof, cinert=cinert)


from jax import custom_batching


@custom_batching.custom_vmap
def kinematics(m: Model, qpos: jnp.ndarray) -> Kin:
    """Forward kinematics.  Unbatched (and therefore the f64
    oracle-parity path): the unrolled-tree reference above, op-for-op.
    One level of vmap on TPU f32 reroutes to the fused Pallas FK kernel
    (physics/fk_kernel.py); vmap elsewhere falls back to vmapping the
    reference."""
    return _kinematics_ref(m, qpos)


@kinematics.def_vmap
def _kinematics_vmap(axis_size, in_batched, m, qpos):
    import os
    import jax
    mb, qb = in_batched
    if not qb:
        qpos = jnp.broadcast_to(qpos, (axis_size,) + qpos.shape)
    # MJE_FK_IMPL selects the f32 batched implementation:
    #   pallas (default on TPU) — fused single-kernel fk_kernel.fk_pallas
    #     (measured v5e device time: 0.02 ms @512, 0.29 ms @4096 — the
    #     fastest by far once tunnel-RTT measurement artifacts are
    #     excluded; round-4's "3.1 ms FK latency floor" was RTT/AMORTIZE,
    #     not device time)
    #   parallel — pointer-doubling _kinematics_parallel (log-depth
    #     dependency graph; correct everywhere and CPU-friendly, but its
    #     batched gathers lower poorly on TPU: 10.9 ms @4096)
    #   ref — vmapped sequential reference (3.7 ms @4096)
    # MJE_NO_FK_KERNEL=1 keeps its historical meaning (never use the
    # Pallas kernel; e.g. if a jax upgrade breaks its Mosaic lowering).
    impl = os.environ.get("MJE_FK_IMPL", "pallas")
    if qpos.dtype != jnp.float32:
        impl = "ref"
    if impl == "pallas" and (jax.default_backend() != "tpu"
                             or os.environ.get(
                                 "MJE_NO_FK_KERNEL", "0") == "1"):
        impl = "ref"
    if impl == "parallel":
        m_axes = jax.tree.map(lambda b: 0 if b else None, mb)
        kin = jax.vmap(_kinematics_parallel, in_axes=(m_axes, 0))(m, qpos)
    elif impl == "pallas":
        from . import fk_kernel
        kin = Kin(*fk_kernel.fk_pallas(m, qpos, mb))
    else:
        m_axes = jax.tree.map(lambda b: 0 if b else None, mb)
        kin = jax.vmap(_kinematics_ref, in_axes=(m_axes, 0))(m, qpos)
    out_batched = Kin(*([True] * len(Kin._fields)))
    return kin, out_batched


def point_jacobian(m: Model, kin: Kin, points: jnp.ndarray,
                   bodyids: jnp.ndarray):
    """Translational/rotational Jacobians of world points on bodies.

    points: (K, 3) world positions; bodyids: (K,) body each point rides on.
    Returns (jacp, jacr) with shapes (K, 3, nv): d(point)/d(qvel) and
    d(angular velocity)/d(qvel).
    """
    s = m.spec
    dtype = points.dtype
    is_hinge = jnp.asarray(s.jnt_type == JNT_HINGE)              # (nv,)
    # (K, nv, 3): per-dof translational contribution at each point.
    rel = points[:, None, :] - kin.xanchor[None, :, :]
    hinge_lin = jnp.cross(kin.xaxis[None, :, :], rel)
    lin = jnp.where(is_hinge[None, :, None], hinge_lin,
                    kin.xaxis[None, :, :])
    ang = jnp.where(is_hinge[None, :, None], kin.xaxis[None, :, :], 0.0)
    mask = jnp.asarray(s.body_dofmask, dtype=dtype)[bodyids]     # (K, nv)
    jacp = (lin * mask[..., None]).swapaxes(-1, -2)              # (K, 3, nv)
    jacr = (ang * mask[..., None]).swapaxes(-1, -2)
    return jacp, jacr
