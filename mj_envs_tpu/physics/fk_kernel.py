"""Fused forward-kinematics Pallas kernel (TPU f32 batch path).

`kinematics.kinematics` unrolls the tree recursion into ~600 tiny XLA ops
on (B, 3)/(B, 4) arrays; at 4096 envs the stage costs ~2.9 ms/substep of
almost pure HBM round-trips and op-launch overhead (round-4 trace).  This
kernel runs the ENTIRE FK — body tree, joints, geom/site poses, subtree
coms, cdof, spatial inertias — as one VMEM-resident Pallas program per
128-lane block, with every quantity held as (1, B) lane vectors.

Layouts are batch-minor: inputs (rows..., B), outputs (rows..., B); the
wrapper moves axes and broadcasts unbatched model fields.  The math
mirrors `physics/maths.py` formula-for-formula; the only intentional
deviation is subtree_com, accumulated leaf-to-root instead of via the
static subtree-mask matmul (same sum, different association — validated
by tests/test_kernels.py::test_fk_kernel* at f32 tolerance).  The f64
oracle-parity path never enters this kernel (kinematics dispatches by
dtype/backend).

Reference behavior being accelerated: the per-step pose/com/inertia
recomputation mujoco performs inside mj_step (`mj_envs_vision`'s hot
loop, hand_manipulation_suite/hammer_v0.py:60).
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from .model import JNT_HINGE, JNT_SLIDE

_INTERPRET = False   # flipped by tests to run on CPU


# ---- component-tuple algebra: every scalar is a (1, B) lane vector ------

def _c3(a, b):
    ax, ay, az = a
    bx, by, bz = b
    return (ay * bz - az * by, az * bx - ax * bz, ax * by - ay * bx)


def _add3(a, b):
    return (a[0] + b[0], a[1] + b[1], a[2] + b[2])


def _sub3(a, b):
    return (a[0] - b[0], a[1] - b[1], a[2] - b[2])


def _scale3(a, s):
    return (a[0] * s, a[1] * s, a[2] * s)


def _qmul(a, b):
    aw, ax, ay, az = a
    bw, bx, by, bz = b
    return (aw * bw - ax * bx - ay * by - az * bz,
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw)


def _qrot(q, v):
    qv = (q[1], q[2], q[3])
    uv = _c3(qv, v)
    uuv = _c3(qv, uv)
    return tuple(v[i] + 2.0 * (q[0] * uv[i] + uuv[i]) for i in range(3))


def _qnorm(q):
    n = jnp.sqrt(q[0] * q[0] + q[1] * q[1] + q[2] * q[2] + q[3] * q[3])
    n = jnp.maximum(n, 1e-15)
    return tuple(c / n for c in q)


def _q2m(q):
    """Quaternion -> 9 rotation-matrix components, row-major (maths
    .quat_to_mat element order)."""
    w, x, y, z = q
    xx, yy, zz = x * x, y * y, z * z
    wx, wy, wz = w * x, w * y, w * z
    xy, xz, yz = x * y, x * z, y * z
    return (1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy),
            2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx),
            2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy))


def _read3(ref, i):
    v = ref[i]
    return (v[0:1], v[1:2], v[2:3])


def _read4(ref, i):
    v = ref[i]
    return (v[0:1], v[1:2], v[2:3], v[3:4])


def _cat(parts):
    return jnp.concatenate(parts, axis=0)


def _w3(ref, i, t):
    ref[i] = _cat(list(t))


def _w9(ref, i, t):
    ref[i] = _cat([_cat(list(t[0:3])), _cat(list(t[3:6])),
                   _cat(list(t[6:9]))])


def _fk_kernel(qpos_ref, body_pos_ref, body_quat_ref, body_ipos_ref,
               body_iquat_ref, jnt_pos_ref, jnt_axis_ref, geom_pos_ref,
               geom_quat_ref, site_pos_ref, site_quat_ref, body_mass_ref,
               body_inertia_ref,
               xpos_ref, xquat_ref, xmat_ref, xipos_ref, geom_xpos_ref,
               geom_xmat_ref, site_xpos_ref, site_xmat_ref, xanchor_ref,
               xaxis_ref, subtree_com_ref, cdof_ref, cinert_ref,
               *, stat):
    (nbody, parentid, jnts_of, jnt_type, jnt_qposadr, jnt_bodyid,
     geom_bodyid, site_bodyid, body_rootid, njnt) = stat

    zero = jnp.zeros_like(qpos_ref[0:1])
    one = zero + 1.0
    xpos = [None] * nbody
    xquat = [None] * nbody
    xpos[0] = (zero, zero, zero)
    xquat[0] = (one, zero, zero, zero)
    xanchor = [None] * njnt
    xaxis = [None] * njnt

    for b in range(1, nbody):
        p = parentid[b]
        pq = _qmul(xquat[p], _read4(body_quat_ref, b))
        pp = _add3(xpos[p], _qrot(xquat[p], _read3(body_pos_ref, b)))
        for j in jnts_of[b]:
            qj = qpos_ref[jnt_qposadr[j]:jnt_qposadr[j] + 1]     # (1, B)
            axis_l = _read3(jnt_axis_ref, j)
            jp = _read3(jnt_pos_ref, j)
            if jnt_type[j] == JNT_SLIDE:
                pp = _add3(pp, _qrot(pq, _scale3(axis_l, qj)))
            else:                                   # hinge
                half = 0.5 * qj
                c, s = jnp.cos(half), jnp.sin(half)
                qrot_q = (c, s * axis_l[0], s * axis_l[1], s * axis_l[2])
                anchor_w = _add3(pp, _qrot(pq, jp))
                pq = _qnorm(_qmul(pq, qrot_q))
                pp = _sub3(anchor_w, _qrot(pq, jp))
            xanchor[j] = _add3(pp, _qrot(pq, jp))
            xaxis[j] = _qrot(pq, axis_l)
            _w3(xanchor_ref, j, xanchor[j])
            _w3(xaxis_ref, j, xaxis[j])
        xpos[b] = pp
        xquat[b] = pq

    xipos = [None] * nbody
    ximat = [None] * nbody
    for b in range(nbody):
        _w3(xpos_ref, b, xpos[b])
        xquat_ref[b] = _cat(list(xquat[b]))
        _w9(xmat_ref, b, _q2m(xquat[b]))
        xipos[b] = _add3(xpos[b], _qrot(xquat[b],
                                        _read3(body_ipos_ref, b)))
        ximat[b] = _q2m(_qmul(xquat[b], _read4(body_iquat_ref, b)))
        _w3(xipos_ref, b, xipos[b])

    for g in range(geom_pos_ref.shape[0]):
        b = geom_bodyid[g]
        _w3(geom_xpos_ref, g,
            _add3(xpos[b], _qrot(xquat[b], _read3(geom_pos_ref, g))))
        _w9(geom_xmat_ref, g,
            _q2m(_qmul(xquat[b], _read4(geom_quat_ref, g))))

    for t in range(site_pos_ref.shape[0]):
        b = site_bodyid[t]
        _w3(site_xpos_ref, t,
            _add3(xpos[b], _qrot(xquat[b], _read3(site_pos_ref, t))))
        _w9(site_xmat_ref, t,
            _q2m(_qmul(xquat[b], _read4(site_quat_ref, t))))

    # Subtree com: leaf-to-root accumulation of (mass, mass*xipos).
    mass = [body_mass_ref[b:b + 1] for b in range(nbody)]
    acc_m = list(mass)
    acc_p = [_scale3(xipos[b], mass[b]) for b in range(nbody)]
    for b in range(nbody - 1, 0, -1):
        p = parentid[b]
        acc_m[p] = acc_m[p] + acc_m[b]
        acc_p[p] = _add3(acc_p[p], acc_p[b])
    com = [None] * nbody
    for b in range(nbody):
        inv = 1.0 / jnp.maximum(acc_m[b], 1e-12)
        com[b] = _scale3(acc_p[b], inv)
        _w3(subtree_com_ref, b, com[b])
    root_com = [com[body_rootid[b]] for b in range(nbody)]

    # cdof: one dof per joint in this suite (hinge/slide only).
    for j in range(njnt):
        b = jnt_bodyid[j]
        if jnt_type[j] == JNT_HINGE:
            ang = xaxis[j]
            lin = _c3(xaxis[j], _sub3(root_com[b], xanchor[j]))
        else:
            ang = (zero, zero, zero)
            lin = xaxis[j]
        cdof_ref[j] = _cat([_cat(list(ang)), _cat(list(lin))])

    # Spatial inertia per body at its tree-root com (maths
    # .spatial_inertia with inert_world = R diag(I) R^T).
    for b in range(nbody):
        R = ximat[b]
        I3 = _read3(body_inertia_ref, b)
        m = mass[b]
        iw = [None] * 9
        for i in range(3):
            for k in range(3):
                iw[3 * i + k] = (R[3 * i + 0] * I3[0] * R[3 * k + 0]
                                 + R[3 * i + 1] * I3[1] * R[3 * k + 1]
                                 + R[3 * i + 2] * I3[2] * R[3 * k + 2])
        d = _sub3(xipos[b], root_com[b])
        dd = d[0] * d[0] + d[1] * d[1] + d[2] * d[2]
        ish = [None] * 9
        for i in range(3):
            for k in range(3):
                diag = dd if i == k else 0.0
                ish[3 * i + k] = iw[3 * i + k] + m * (diag - d[i] * d[k])
        sk = (zero, -d[2], d[1],
              d[2], zero, -d[0],
              -d[1], d[0], zero)
        msk = [m * c for c in sk]
        mskT = [msk[0], msk[3], msk[6],
                msk[1], msk[4], msk[7],
                msk[2], msk[5], msk[8]]
        mI = [m if i % 4 == 0 else zero for i in range(9)]
        # 6x6 row-major: rows 0-2 = [I_shift | m skew], 3-5 = [m skew^T | mI]
        for r in range(3):
            cinert_ref[b, 6 * r:6 * (r + 1)] = _cat(
                [ish[3 * r], ish[3 * r + 1], ish[3 * r + 2],
                 msk[3 * r], msk[3 * r + 1], msk[3 * r + 2]])
        for r in range(3):
            cinert_ref[b, 18 + 6 * r:18 + 6 * (r + 1)] = _cat(
                [mskT[3 * r], mskT[3 * r + 1], mskT[3 * r + 2],
                 mI[3 * r], mI[3 * r + 1], mI[3 * r + 2]])


def _static(m):
    s = m.spec
    jnts_of = [[] for _ in range(s.nbody)]
    for j in range(s.njnt):
        jnts_of[int(s.jnt_bodyid[j])].append(j)
    return (int(s.nbody),
            tuple(int(x) for x in s.body_parentid),
            tuple(tuple(js) for js in jnts_of),
            tuple(int(x) for x in s.jnt_type),
            tuple(int(x) for x in s.jnt_qposadr),
            tuple(int(x) for x in s.jnt_bodyid),
            tuple(int(x) for x in s.geom_bodyid),
            tuple(int(x) for x in s.site_bodyid),
            tuple(int(x) for x in s.body_rootid),
            int(s.njnt))


def fk_pallas(m, qpos_b, model_batched, block_b: int = 128):
    """Batched FK on TPU.  qpos_b (B, nq) f32; model fields arrive
    batched (B, ...) or unbatched per `model_batched` (a Model of
    bools).  Returns the Kin fields batch-major."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    s = m.spec
    B = qpos_b.shape[0]
    pad = (-B) % block_b
    Bp = B + pad
    dtype = qpos_b.dtype

    def bm(field, batched):
        x = field
        if not batched:
            x = jnp.broadcast_to(x[None], (B,) + x.shape)
        if pad:
            x = jnp.concatenate(
                [x, jnp.broadcast_to(x[:1], (pad,) + x.shape[1:])], axis=0)
        return jnp.moveaxis(x, 0, -1)

    mb = model_batched
    inputs = [
        bm(qpos_b, True),                               # (nq, B)
        bm(m.body_pos, mb.body_pos), bm(m.body_quat, mb.body_quat),
        bm(m.body_ipos, mb.body_ipos), bm(m.body_iquat, mb.body_iquat),
        bm(m.jnt_pos, mb.jnt_pos), bm(m.jnt_axis, mb.jnt_axis),
        bm(m.geom_pos, mb.geom_pos), bm(m.geom_quat, mb.geom_quat),
        bm(m.site_pos, mb.site_pos), bm(m.site_quat, mb.site_quat),
        bm(m.body_mass, mb.body_mass),                  # (nbody, B)
        bm(m.body_inertia, mb.body_inertia),
    ]

    def spec_shape(shape):
        blk = tuple(shape[:-1]) + (block_b,)
        nlead = len(blk) - 1
        return pl.BlockSpec(
            blk, (lambda g, _n=nlead: (0,) * _n + (g,)),
            memory_space=pltpu.VMEM)

    def spec_of(x):
        return spec_shape(x.shape)

    nb, ng, nt, nj, nv = (s.nbody, s.ngeom, s.nsite, s.njnt, s.nv)
    out_shapes = [
        jax.ShapeDtypeStruct((nb, 3, Bp), dtype),   # xpos
        jax.ShapeDtypeStruct((nb, 4, Bp), dtype),   # xquat
        jax.ShapeDtypeStruct((nb, 9, Bp), dtype),   # xmat
        jax.ShapeDtypeStruct((nb, 3, Bp), dtype),   # xipos
        jax.ShapeDtypeStruct((ng, 3, Bp), dtype),   # geom_xpos
        jax.ShapeDtypeStruct((ng, 9, Bp), dtype),   # geom_xmat
        jax.ShapeDtypeStruct((nt, 3, Bp), dtype),   # site_xpos
        jax.ShapeDtypeStruct((nt, 9, Bp), dtype),   # site_xmat
        jax.ShapeDtypeStruct((nj, 3, Bp), dtype),   # xanchor
        jax.ShapeDtypeStruct((nj, 3, Bp), dtype),   # xaxis
        jax.ShapeDtypeStruct((nb, 3, Bp), dtype),   # subtree_com
        jax.ShapeDtypeStruct((nv, 6, Bp), dtype),   # cdof
        jax.ShapeDtypeStruct((nb, 36, Bp), dtype),  # cinert
    ]
    outs = pl.pallas_call(
        functools.partial(_fk_kernel, stat=_static(m)),
        grid=(Bp // block_b,),
        in_specs=[spec_of(x) for x in inputs],
        out_specs=tuple(spec_shape(sh.shape) for sh in out_shapes),
        out_shape=tuple(out_shapes),
        interpret=_INTERPRET,
    )(*inputs)

    def unbm(x):
        x = jnp.moveaxis(x, -1, 0)
        return x[:B] if pad else x

    (xpos, xquat, xmat, xipos, geom_xpos, geom_xmat, site_xpos,
     site_xmat, xanchor, xaxis, subtree_com, cdof, cinert) = map(
         unbm, outs)
    xmat = xmat.reshape(B, nb, 3, 3)
    geom_xmat = geom_xmat.reshape(B, ng, 3, 3)
    site_xmat = site_xmat.reshape(B, nt, 3, 3)
    cinert = cinert.reshape(B, nb, 6, 6)
    root_com = subtree_com[:, np.asarray(s.body_rootid)]
    return (xpos, xquat, xmat, xipos, geom_xpos, geom_xmat, site_xpos,
            site_xmat, xanchor, xaxis, subtree_com, root_com, cdof,
            cinert)
