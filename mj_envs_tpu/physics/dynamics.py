"""Smooth dynamics: CRB mass matrix, RNE bias forces, passive forces.

Everything is expressed in the per-tree com frame produced by
``kinematics.kinematics`` and reduced with static-mask einsums, which XLA
lowers to batched matmuls (MXU) over the env axis.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from . import maths
from .kinematics import Kin
from .model import Model


class Vel(NamedTuple):
    cvel: jnp.ndarray       # (nbody, 6) body spatial velocity, com frame
    cdof_dot: jnp.ndarray   # (nv, 6) time-derivative of cdof


def crb(m: Model, kin: Kin) -> jnp.ndarray:
    """Composite-rigid-body mass matrix, dense (nv, nv), armature included."""
    s = m.spec
    dtype = kin.cdof.dtype
    subtree = jnp.asarray(s.subtree_mask, dtype=dtype)        # (nbody, nbody)
    icomp = jnp.einsum("bd,dij->bij", subtree, kin.cinert)    # (nbody, 6, 6)
    # F[j] = Icomp[body(j)] @ cdof[j] — f32: broadcast-multiply-sum
    # (batched 6-wide dot_generals pad to the 128-wide MXU); f64 keeps
    # the historical einsum for oracle-parity bits.
    if dtype == jnp.float64:
        F = jnp.einsum("jik,jk->ji", icomp[s.jnt_bodyid], kin.cdof)
    else:
        F = jnp.sum(icomp[s.jnt_bodyid] * kin.cdof[:, None, :], axis=-1)
    M = jnp.einsum("ik,jk->ij", kin.cdof, F)                  # (nv, nv)
    # M[i, j] above is only valid where dof j is the deeper one (i on j's
    # path, i <= j): mask the upper triangle and mirror it.
    mask = jnp.asarray(s.ancestor_mask, dtype=dtype)          # (nv, nv)
    upper = M * mask
    M = upper + upper.T - jnp.diag(jnp.diag(upper))
    return M + jnp.diag(m.dof_armature)


def com_velocity(m: Model, kin: Kin, qvel: jnp.ndarray) -> Vel:
    s = m.spec
    dtype = qvel.dtype
    body_dofmask = jnp.asarray(s.body_dofmask, dtype=dtype)   # (nbody, nv)
    cdof_qvel = kin.cdof * qvel[:, None]                      # (nv, 6)
    cvel = body_dofmask @ cdof_qvel                           # (nbody, 6)
    strict = jnp.asarray(s.dof_strict_pred, dtype=dtype)      # (nv, nv)
    v_pred = strict @ cdof_qvel                               # (nv, 6)
    cdof_dot = maths.motion_cross(v_pred, kin.cdof)
    return Vel(cvel=cvel, cdof_dot=cdof_dot)


def bias_force(m: Model, kin: Kin, vel: Vel, qvel: jnp.ndarray
               ) -> jnp.ndarray:
    """qfrc_bias = C(q, v) qvel + gravity term (RNE with qacc = 0)."""
    s = m.spec
    dtype = qvel.dtype
    body_dofmask = jnp.asarray(s.body_dofmask, dtype=dtype)
    # Base "acceleration" encodes gravity: a0 = [0; -g].
    a0 = jnp.concatenate(
        [jnp.zeros(3, dtype=dtype),
         -jnp.asarray(s.gravity, dtype=dtype)])
    cacc = a0 + body_dofmask @ (vel.cdof_dot * qvel[:, None])  # (nbody, 6)
    # Per-body bias force: f = I a + v x* (I v).  f32:
    # broadcast-multiply-sum (batched 6-wide dot_generals pad to the
    # 128-wide MXU); f64 keeps the historical einsum for parity bits.
    if dtype == jnp.float64:
        Iv = jnp.einsum("bij,bj->bi", kin.cinert, vel.cvel)
        Ia = jnp.einsum("bij,bj->bi", kin.cinert, cacc)
    else:
        Iv = jnp.sum(kin.cinert * vel.cvel[:, None, :], axis=-1)
        Ia = jnp.sum(kin.cinert * cacc[:, None, :], axis=-1)
    f = Ia + maths.force_cross(vel.cvel, Iv)                   # (nbody, 6)
    # Project onto dofs: qfrc_bias[i] = cdof_i . sum_{b in subtree(body_i)} f_b
    # body_dofmask[b, i] == dof i on path of b == b in subtree of body(i).
    fsum = body_dofmask.T @ f                                  # (nv, 6)
    return jnp.sum(kin.cdof * fsum, axis=-1)


def passive_force(m: Model, qpos: jnp.ndarray, qvel: jnp.ndarray
                  ) -> jnp.ndarray:
    """Joint springs and dampers (tendon spring/damping are zero in this
    suite; frictionloss is a constraint, not a passive force)."""
    spring = -m.jnt_stiffness * (qpos - m.jnt_springref)
    damper = -m.dof_damping * qvel
    return spring + damper
