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
    # MJE_NO_FK_KERNEL=1: escape hatch to the vmapped-reference path
    # (e.g. if a jax upgrade breaks the kernel's Mosaic lowering).
    use_pallas = (qpos.dtype == jnp.float32
                  and jax.default_backend() == "tpu"
                  and os.environ.get("MJE_NO_FK_KERNEL", "0") != "1")
    if use_pallas:
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
