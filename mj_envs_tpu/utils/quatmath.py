"""JAX ports of the rotation conversions used by the task layer.

These reproduce the exact formulas of the reference's
`mj_envs_vision/utils/quatmath.py` (euler2quat :60-76, mat2euler :79-96,
quat2euler :136-138, quat2mat :141-164) because they are part of the
observation / reset contract: hammer-v0's observation embeds
`quat2euler(body_xquat)` (reference `hammer_v0.py:99`) and pen-v0's reset
uses `euler2quat` (reference `pen_v0.py:122`).  Batched and jit-safe.
"""
from __future__ import annotations

import jax.numpy as jnp

_EPS4 = jnp.finfo(jnp.float64).eps * 4.0


def euler2quat(euler: jnp.ndarray) -> jnp.ndarray:
    """Intrinsic xyz Euler angles (...,3) -> (...,4) wxyz quaternion."""
    ai, aj, ak = euler[..., 2] / 2, -euler[..., 1] / 2, euler[..., 0] / 2
    si, sj, sk = jnp.sin(ai), jnp.sin(aj), jnp.sin(ak)
    ci, cj, ck = jnp.cos(ai), jnp.cos(aj), jnp.cos(ak)
    cc, cs = ci * ck, ci * sk
    sc, ss = si * ck, si * sk
    return jnp.stack(
        [
            cj * cc + sj * ss,
            cj * cs - sj * sc,
            -(cj * ss + sj * cc),
            cj * sc - sj * cs,
        ],
        axis=-1,
    )


def quat2mat(quat: jnp.ndarray) -> jnp.ndarray:
    """(...,4) wxyz -> (...,3,3); returns identity for near-zero quats."""
    w, x, y, z = quat[..., 0], quat[..., 1], quat[..., 2], quat[..., 3]
    nq = jnp.sum(quat * quat, axis=-1)
    s = 2.0 / jnp.where(nq > 0, nq, 1.0)
    X, Y, Z = x * s, y * s, z * s
    wX, wY, wZ = w * X, w * Y, w * Z
    xX, xY, xZ = x * X, x * Y, x * Z
    yY, yZ, zZ = y * Y, y * Z, z * Z
    mat = jnp.stack(
        [
            1.0 - (yY + zZ), xY - wZ, xZ + wY,
            xY + wZ, 1.0 - (xX + zZ), yZ - wX,
            xZ - wY, yZ + wX, 1.0 - (xX + yY),
        ],
        axis=-1,
    ).reshape(quat.shape[:-1] + (3, 3))
    eps = jnp.finfo(quat.dtype).eps
    return jnp.where((nq > eps)[..., None, None], mat,
                     jnp.eye(3, dtype=quat.dtype))


def mat2euler(mat: jnp.ndarray) -> jnp.ndarray:
    """(...,3,3) -> (...,3) Euler angles (reference convention)."""
    cy = jnp.sqrt(mat[..., 2, 2] ** 2 + mat[..., 1, 2] ** 2)
    cond = cy > _EPS4
    e2 = jnp.where(
        cond,
        -jnp.arctan2(mat[..., 0, 1], mat[..., 0, 0]),
        -jnp.arctan2(-mat[..., 1, 0], mat[..., 1, 1]),
    )
    e1 = -jnp.arctan2(-mat[..., 0, 2], cy)
    e0 = jnp.where(cond, -jnp.arctan2(mat[..., 1, 2], mat[..., 2, 2]), 0.0)
    return jnp.stack([e0, e1, e2], axis=-1)


def quat2euler(quat: jnp.ndarray) -> jnp.ndarray:
    return mat2euler(quat2mat(quat))


def mulQuat(qa: jnp.ndarray, qb: jnp.ndarray) -> jnp.ndarray:
    return jnp.stack(
        [
            qa[..., 0] * qb[..., 0] - qa[..., 1] * qb[..., 1]
            - qa[..., 2] * qb[..., 2] - qa[..., 3] * qb[..., 3],
            qa[..., 0] * qb[..., 1] + qa[..., 1] * qb[..., 0]
            + qa[..., 2] * qb[..., 3] - qa[..., 3] * qb[..., 2],
            qa[..., 0] * qb[..., 2] - qa[..., 1] * qb[..., 3]
            + qa[..., 2] * qb[..., 0] + qa[..., 3] * qb[..., 1],
            qa[..., 0] * qb[..., 3] + qa[..., 1] * qb[..., 2]
            - qa[..., 2] * qb[..., 1] + qa[..., 3] * qb[..., 0],
        ],
        axis=-1,
    )


def negQuat(quat: jnp.ndarray) -> jnp.ndarray:
    return quat * jnp.asarray([1.0, -1.0, -1.0, -1.0], dtype=quat.dtype)


def quat2Vel(quat: jnp.ndarray, dt: float = 1.0):
    axis = quat[..., 1:]
    sin_a_2 = jnp.sqrt(jnp.sum(axis ** 2, axis=-1))
    axis = axis / (sin_a_2[..., None] + 1e-8)
    speed = 2 * jnp.arctan2(sin_a_2, quat[..., 0]) / dt
    return speed, axis


def quatDiff2Vel(quat1: jnp.ndarray, quat2: jnp.ndarray, dt: float):
    return quat2Vel(mulQuat(quat2, negQuat(quat1)), dt)


def axis_angle2quat(axis: jnp.ndarray, angle: jnp.ndarray) -> jnp.ndarray:
    c = jnp.cos(angle / 2)[..., None]
    s = jnp.sin(angle / 2)[..., None]
    return jnp.concatenate([c, s * axis], axis=-1)


def mat2quat(mat: jnp.ndarray) -> jnp.ndarray:
    """(...,3,3) rotation matrix -> (...,4) wxyz quaternion.

    Reference algorithm (`mj_envs_vision/utils/quatmath.py:99-133`): the
    largest-eigenvalue eigenvector of the symmetric 4x4 K matrix, with w
    made non-negative.  Batched via jnp.linalg.eigh (ascending order, so
    the largest eigenvector is the last column) instead of the
    reference's per-element nditer loop.
    """
    Qxx, Qyx, Qzx = mat[..., 0, 0], mat[..., 0, 1], mat[..., 0, 2]
    Qxy, Qyy, Qzy = mat[..., 1, 0], mat[..., 1, 1], mat[..., 1, 2]
    Qxz, Qyz, Qzz = mat[..., 2, 0], mat[..., 2, 1], mat[..., 2, 2]
    z = jnp.zeros_like(Qxx)
    # Rows of the symmetric K matrix (lower half mirrored).
    K = jnp.stack([
        jnp.stack([Qxx - Qyy - Qzz, Qyx + Qxy, Qzx + Qxz, Qyz - Qzy],
                  axis=-1),
        jnp.stack([Qyx + Qxy, Qyy - Qxx - Qzz, Qzy + Qyz, Qzx - Qxz],
                  axis=-1),
        jnp.stack([Qzx + Qxz, Qzy + Qyz, Qzz - Qxx - Qyy, Qxy - Qyx],
                  axis=-1),
        jnp.stack([Qyz - Qzy, Qzx - Qxz, Qxy - Qyx, Qxx + Qyy + Qzz],
                  axis=-1),
    ], axis=-2) / 3.0
    _, vecs = jnp.linalg.eigh(K)
    v = vecs[..., -1]                      # largest eigenvalue (ascending)
    q = jnp.stack([v[..., 3], v[..., 0], v[..., 1], v[..., 2]], axis=-1)
    return q * jnp.where(q[..., 0:1] < 0, -1.0, 1.0)


def euler2mat(euler: jnp.ndarray) -> jnp.ndarray:
    """Euler angles (...,3) -> rotation matrix (reference formula)."""
    ai, aj, ak = -euler[..., 2], -euler[..., 1], -euler[..., 0]
    si, sj, sk = jnp.sin(ai), jnp.sin(aj), jnp.sin(ak)
    ci, cj, ck = jnp.cos(ai), jnp.cos(aj), jnp.cos(ak)
    cc, cs = ci * ck, ci * sk
    sc, ss = si * ck, si * sk
    row0 = jnp.stack([cj * ci, cj * si, -sj], axis=-1)
    row1 = jnp.stack([sj * cs - sc, sj * ss + cc, cj * sk], axis=-1)
    row2 = jnp.stack([sj * cc + ss, sj * sc - cs, cj * ck], axis=-1)
    return jnp.stack([row0, row1, row2], axis=-2)
