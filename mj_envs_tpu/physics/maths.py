"""Quaternion and spatial-vector algebra (JAX, batched, jit-safe).

Conventions follow MuJoCo: quaternions are (w, x, y, z); 6D spatial motion /
force vectors are ordered [angular(3); linear(3)] and expressed in world axes
at a common frame origin (the "com frame" of each kinematic tree), so spatial
quantities of bodies in one tree compose by plain addition.

All functions broadcast over leading axes and are dtype-polymorphic (f32/f64).
"""
from __future__ import annotations

import jax.numpy as jnp


# ---------------------------------------------------------------------------
# Quaternions
# ---------------------------------------------------------------------------

def quat_mul(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Hamilton product a*b for (..., 4) wxyz quaternions."""
    aw, ax, ay, az = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    bw, bx, by, bz = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack(
        [
            aw * bw - ax * bx - ay * by - az * bz,
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
        ],
        axis=-1,
    )


def quat_conj(q: jnp.ndarray) -> jnp.ndarray:
    return q * jnp.asarray([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def quat_normalize(q: jnp.ndarray, eps: float = 1e-15) -> jnp.ndarray:
    n = jnp.linalg.norm(q, axis=-1, keepdims=True)
    return q / jnp.maximum(n, eps)


def quat_rot(q: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Rotate vector(s) v by quaternion(s) q.  Shapes broadcast."""
    qw = q[..., :1]
    qv = q[..., 1:]
    # v' = v + 2*qw*(qv x v) + 2*qv x (qv x v)
    uv = jnp.cross(qv, v)
    uuv = jnp.cross(qv, uv)
    return v + 2.0 * (qw * uv + uuv)


def quat_rot_inv(q: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    return quat_rot(quat_conj(q), v)


def quat_to_mat(q: jnp.ndarray) -> jnp.ndarray:
    """(..., 4) wxyz -> (..., 3, 3) rotation matrix."""
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    xx, yy, zz = x * x, y * y, z * z
    wx, wy, wz = w * x, w * y, w * z
    xy, xz, yz = x * y, x * z, y * z
    m = jnp.stack(
        [
            1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy),
            2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx),
            2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy),
        ],
        axis=-1,
    )
    return m.reshape(q.shape[:-1] + (3, 3))


def axis_angle_to_quat(axis: jnp.ndarray, angle: jnp.ndarray) -> jnp.ndarray:
    """Unit axis (...,3), angle (...,) -> (...,4) quaternion."""
    half = 0.5 * angle
    c = jnp.cos(half)[..., None]
    s = jnp.sin(half)[..., None]
    return jnp.concatenate([c, s * axis], axis=-1)


# ---------------------------------------------------------------------------
# Spatial vectors ([angular; linear], MuJoCo ordering)
# ---------------------------------------------------------------------------

def motion_cross(v: jnp.ndarray, m: jnp.ndarray) -> jnp.ndarray:
    """Motion-space cross product v x m (mju_crossMotion)."""
    va, vl = v[..., :3], v[..., 3:]
    ma, ml = m[..., :3], m[..., 3:]
    return jnp.concatenate(
        [jnp.cross(va, ma), jnp.cross(va, ml) + jnp.cross(vl, ma)], axis=-1
    )


def force_cross(v: jnp.ndarray, f: jnp.ndarray) -> jnp.ndarray:
    """Force-space cross product v x* f (mju_crossForce)."""
    va, vl = v[..., :3], v[..., 3:]
    fa, fl = f[..., :3], f[..., 3:]
    return jnp.concatenate(
        [jnp.cross(va, fa) + jnp.cross(vl, fl), jnp.cross(va, fl)], axis=-1
    )


def spatial_inertia(mass: jnp.ndarray, inertia_mat: jnp.ndarray,
                    offset: jnp.ndarray) -> jnp.ndarray:
    """6x6 spatial inertia about a point displaced by `offset` from the com.

    `inertia_mat`: (..., 3, 3) rotational inertia about the body com in world
    axes.  `offset`: (..., 3) vector from the reference point to the body com
    (com - point).  Returns (..., 6, 6) with [angular; linear] ordering, i.e.
    f = I @ v maps motion [w; v] to force [torque; force] about the point.
    """
    d = offset
    m = mass[..., None, None]
    eye = jnp.eye(3, dtype=inertia_mat.dtype)
    ddT = d[..., :, None] * d[..., None, :]
    dd = jnp.sum(d * d, axis=-1)[..., None, None]
    # Parallel-axis shift of the rotational block.
    I_shift = inertia_mat + m * (dd * eye - ddT)
    # Coupling block: m * skew(d).
    zeros = jnp.zeros_like(d[..., 0])
    skew_d = jnp.stack(
        [
            zeros, -d[..., 2], d[..., 1],
            d[..., 2], zeros, -d[..., 0],
            -d[..., 1], d[..., 0], zeros,
        ],
        axis=-1,
    ).reshape(d.shape[:-1] + (3, 3))
    top = jnp.concatenate([I_shift, m * skew_d], axis=-1)
    bot = jnp.concatenate([m * skew_d.mT, m * eye + jnp.zeros_like(I_shift)],
                          axis=-1)
    return jnp.concatenate([top, bot], axis=-2)


def skew(v: jnp.ndarray) -> jnp.ndarray:
    """(...,3) -> (...,3,3) cross-product matrix."""
    z = jnp.zeros_like(v[..., 0])
    return jnp.stack(
        [
            z, -v[..., 2], v[..., 1],
            v[..., 2], z, -v[..., 0],
            -v[..., 1], v[..., 0], z,
        ],
        axis=-1,
    ).reshape(v.shape[:-1] + (3, 3))


def normalize(v: jnp.ndarray, eps: float = 1e-15):
    n = jnp.linalg.norm(v, axis=-1, keepdims=True)
    return v / jnp.maximum(n, eps), n[..., 0]
