"""Collision driver: run narrowphase over all static candidate pairs and
compact active contacts into a fixed-capacity buffer for the solver.

The candidate pair list, slot layout, and per-type grouping are static
(ModelSpec); only geometry flows through traced code.  Under vmap the
grouped narrowphase calls become large batched elementwise ops.
"""
from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from ..model import (Model, Contact, GEOM_PLANE, GEOM_SPHERE, GEOM_CAPSULE,
                     GEOM_CYLINDER, GEOM_BOX)
from ..kinematics import Kin
from . import narrowphase as NP

_FNS = {
    (GEOM_PLANE, GEOM_SPHERE): (NP.plane_sphere, 1),
    (GEOM_PLANE, GEOM_CAPSULE): (NP.plane_capsule, 2),
    (GEOM_PLANE, GEOM_CYLINDER): (NP.plane_cylinder, 4),
    (GEOM_PLANE, GEOM_BOX): (NP.plane_box, 8),
    (GEOM_SPHERE, GEOM_SPHERE): (NP.sphere_sphere, 1),
    (GEOM_SPHERE, GEOM_CAPSULE): (NP.sphere_capsule, 1),
    (GEOM_SPHERE, GEOM_CYLINDER): (NP.sphere_cylinder, 1),
    (GEOM_SPHERE, GEOM_BOX): (NP.sphere_box, 1),
    (GEOM_CAPSULE, GEOM_CAPSULE): (NP.capsule_capsule, 2),
    (GEOM_CAPSULE, GEOM_CYLINDER): (NP.capsule_cylinder, 2),
    (GEOM_CAPSULE, GEOM_BOX): (NP.capsule_box, 2),
    (GEOM_CYLINDER, GEOM_CYLINDER): (NP.cylinder_cylinder, 4),
    (GEOM_CYLINDER, GEOM_BOX): (NP.cylinder_box, 4),
    (GEOM_BOX, GEOM_BOX): (NP.box_box, 24),
}

# Contact SLOTS a pair contributes to the global buffer (box_box's 24
# manifold candidates could be squeezed to the <= 8 geometrically valid
# ones, but the A/B measured the one-hot squeeze contraction at +2.8 ms
# vs ~1 ms of downstream savings at 4096 envs — slots stay raw).
_SLOTS = {key: mc for key, (fn, mc) in _FNS.items()}


class CompactContacts(NamedTuple):
    """Fixed-capacity active contact set (ncmax slots)."""
    pairid: jnp.ndarray   # (ncmax,) int — candidate pair index (or 0)
    dist: jnp.ndarray     # (ncmax,)
    pos: jnp.ndarray      # (ncmax, 3)
    frame: jnp.ndarray    # (ncmax, 3, 3) rows [n, t1, t2]
    active: jnp.ndarray   # (ncmax,) bool
    geom1: jnp.ndarray    # (ncmax,) int
    geom2: jnp.ndarray    # (ncmax,) int
    condim: jnp.ndarray   # (ncmax,) int


def _make_tangents(n: jnp.ndarray):
    """Complete a right-handed frame from normals, exactly mju_makeFrame:
    seed with +Z when |n_z| < 0.5 else +Y, orthogonalize, cross.  The seed
    choice fixes the friction-pyramid facet directions, which are
    observable through the solved contact forces (oracle diff showed the
    rotated-facet error directly)."""
    z_seed = jnp.abs(n[..., 2]) < 0.5
    e = jnp.where(z_seed[..., None],
                  jnp.array([0.0, 0.0, 1.0], dtype=n.dtype),
                  jnp.array([0.0, 1.0, 0.0], dtype=n.dtype))
    t1 = e - n * jnp.sum(n * e, axis=-1, keepdims=True)
    t1 = t1 / jnp.maximum(jnp.linalg.norm(t1, axis=-1, keepdims=True),
                          1e-12)
    t2 = jnp.cross(n, t1)
    return t1, t2


def narrowphase_all(m: Model, kin: Kin) -> Contact:
    """Run type-grouped narrowphase for every candidate pair; results land
    in the static slot buffer."""
    s = m.spec
    dtype = kin.geom_xpos.dtype
    dist = jnp.full((s.ncon_cap,), NP.BIG, dtype=dtype)
    pos = jnp.zeros((s.ncon_cap, 3), dtype=dtype)
    nrm = jnp.zeros((s.ncon_cap, 3), dtype=dtype)

    gt = s.geom_type
    # Group candidate pairs by type pair (static, python-level).  The
    # builder orders the pair table by type group, so each group's pairs
    # (and their contact slots) are CONTIGUOUS — results are assembled by
    # concatenation in slot order.  (Scatters into interleaved slots were
    # the dominant collide() cost on TPU.)
    groups = []          # (key, [pids]) in pair order
    for pid in range(s.npair):
        key = (int(gt[s.pair_geom1[pid]]), int(gt[s.pair_geom2[pid]]))
        if groups and groups[-1][0] == key:
            groups[-1][1].append(pid)
        else:
            groups.append((key, [pid]))

    # Gather geom poses for ALL pairs at once via one-hot matmuls (TPU
    # gathers with tiny trailing dims lower poorly; a (P, ngeom) 0/1
    # matmul rides the MXU) — per-group inputs are then free contiguous
    # slices.
    def onehot(idx):
        e = np.zeros((len(idx), s.ngeom), dtype=np.float32)
        e[np.arange(len(idx)), idx] = 1.0
        return jnp.asarray(e, dtype=dtype)

    E1 = onehot(s.pair_geom1)
    E2 = onehot(s.pair_geom2)
    xmat_flat = kin.geom_xmat.reshape(s.ngeom, 9)
    xpos1 = E1 @ kin.geom_xpos            # (npair, 3)
    xmat1 = (E1 @ xmat_flat).reshape(-1, 3, 3)
    xpos2 = E2 @ kin.geom_xpos
    xmat2 = (E2 @ xmat_flat).reshape(-1, 3, 3)
    # geom_size can be per-env (hammer size variations) — same treatment.
    size1_all = E1 @ m.geom_size
    size2_all = E2 @ m.geom_size

    chunks_d, chunks_p, chunks_n = [], [], []
    start = 0
    for key, pids in groups:
        fn, maxcon = _FNS[key]
        P = len(pids)
        pids_np = np.asarray(pids, dtype=np.int32)
        g1 = s.pair_geom1[pids_np]
        g2 = s.pair_geom2[pids_np]
        sl = slice(start, start + P)
        d_g, p_g, n_g = jax.vmap(fn)(
            xpos1[sl], xmat1[sl], size1_all[sl],
            xpos2[sl], xmat2[sl], size2_all[sl],
            m.pair_margin[pids_np])
        chunks_d.append(d_g.reshape(-1).astype(dtype))
        chunks_p.append(p_g.reshape(-1, 3).astype(dtype))
        chunks_n.append(n_g.reshape(-1, 3).astype(dtype))
        start += P
    if chunks_d:
        dist = jnp.concatenate(chunks_d)
        pos = jnp.concatenate(chunks_p)
        nrm = jnp.concatenate(chunks_n)
        assert dist.shape[0] == s.ncon_cap, (dist.shape, s.ncon_cap)

    margin = m.pair_margin[s.con_pairid]
    active = dist < margin
    return Contact(dist=dist, pos=pos, nrm=nrm, active=active)


def compact(m: Model, con: Contact, ncmax: int) -> CompactContacts:
    """Select up to ncmax active slots (slot order preserved).  The
    [n, t1, t2] frame is built here, on the selected normals only."""
    s = m.spec
    idx = jnp.nonzero(con.active, size=ncmax, fill_value=s.ncon_cap)[0]
    valid = idx < s.ncon_cap
    idx_c = jnp.minimum(idx, s.ncon_cap - 1)
    pairid = jnp.asarray(s.con_pairid)[idx_c]
    nrm = con.nrm[idx_c]
    t1, t2 = _make_tangents(nrm)
    return CompactContacts(
        pairid=pairid,
        dist=jnp.where(valid, con.dist[idx_c], NP.BIG),
        pos=con.pos[idx_c],
        frame=jnp.stack([nrm, t1, t2], axis=-2),
        active=valid,
        geom1=jnp.asarray(s.con_geom1)[idx_c],
        geom2=jnp.asarray(s.con_geom2)[idx_c],
        condim=jnp.where(valid, jnp.asarray(s.con_condim)[idx_c], 1),
    )


def _compact_batched(m: Model, con: Contact, ncmax: int) -> CompactContacts:
    """Batched compaction as one-hot contractions (MXU) instead of per-env
    nonzero + gather.

    vmapped `compact` lowers to per-env gathers of (S, 3)/(S, 3, 3) values
    with tiny trailing dims — ~10 ms of the 26 ms hammer substep at 1024
    envs on TPU.  Here each output slot c selects the (c+1)-th active
    candidate via an exact {0,1} one-hot built from a running rank, and the
    value pickup is an einsum that rides the MXU (~1 ms).

    Exactness: each output slot receives exactly one active slot's value
    times 1.0 plus exact zeros (values are sanitized to 0 at inactive
    candidates first, so a NaN in a non-selected slot cannot contaminate
    the sum), so active outputs match compact() bit-for-bit.  Inactive
    output slots are zero-filled rather than compact()'s clamped last-slot
    gather; every consumer masks by `active` (make_rows row_live,
    pipeline._sensors) so the difference is unobservable.
    """
    s = m.spec
    dtype = con.dist.dtype
    B, S = con.dist.shape
    af = con.active.astype(dtype)                        # (B, S)
    rank = jnp.cumsum(af, axis=1) - af                   # (B, S)
    slots = jnp.arange(ncmax, dtype=dtype)
    oh = (con.active[:, :, None]
          & (rank[:, :, None] == slots)).astype(dtype)   # (B, S, C)

    # Dynamic channels dist | pos(3) | nrm(3) plus the static per-slot
    # tables pairid | geom1 | geom2 | condim (values < 2^24, exact in
    # f32), all in ONE contraction so the (B, S, C) one-hot is read once.
    stat = jnp.stack([
        jnp.asarray(s.con_pairid, dtype=dtype),
        jnp.asarray(s.con_geom1, dtype=dtype),
        jnp.asarray(s.con_geom2, dtype=dtype),
        jnp.asarray(s.con_condim, dtype=dtype)], axis=-1)    # (S, 4)
    vals = jnp.concatenate(
        [jnp.where(con.active[..., None],
                   jnp.concatenate([con.dist[..., None], con.pos,
                                    con.nrm], axis=-1), 0.0),
         jnp.broadcast_to(stat, (B, S, 4))], axis=-1)    # (B, S, 11)
    out = jnp.einsum("bsc,bsv->bcv", oh, vals,
                     precision=jax.lax.Precision.HIGHEST)    # (B, C, 11)

    nact = jnp.sum(af, axis=1)                           # (B,)
    valid = slots[None, :] < nact[:, None]               # (B, C)
    # Static channels: each active output slot sums exactly one 1.0 x
    # table value; inactive slots sum to 0 (handled by the masks below).
    ints = jnp.round(out[..., 7:11]).astype(jnp.int32)
    nrm = out[..., 4:7]
    t1, t2 = _make_tangents(nrm)
    # CONTRACT: `frame` is UNDEFINED for slots with active=False — the
    # zero normal there makes _make_tangents emit its seed vector as t1
    # ([0, seed, 0] rows), not an all-zero frame.  Every consumer
    # (constraint.make_rows, sensors) must mask by `active`; do not add
    # a `valid` mask here, it would cost a (B, C, 3, 3) where-pass per
    # substep for values nothing may read (ADVICE r4 item 3).
    return CompactContacts(
        pairid=ints[..., 0],
        dist=jnp.where(valid, out[..., 0], NP.BIG),
        pos=out[..., 1:4],
        frame=jnp.stack([nrm, t1, t2], axis=-2),
        active=valid,
        geom1=ints[..., 1],
        geom2=ints[..., 2],
        condim=jnp.where(valid, ints[..., 3], 1),
    )


def _narrowphase_all_batched(m: Model, kin: Kin,
                             size_batched: bool) -> Contact:
    """Batched narrowphase in batch-minor (env-last) layout.

    Under plain vmap every narrowphase intermediate is laid out with the
    env axis leading and tiny (3,)/(3,3) axes minormost; the TPU pads the
    two minor dims to (8,128) vector registers, a ~64x waste that made
    collide() ~45% of the whole physics substep.  Transposing the inputs
    to (components..., P, B) and vmapping with in_axes/out_axes=-1 keeps
    the env axis in vector lanes through the entire elementwise pipeline
    (bit-identical results; box_box 14.4 ms -> 0.75 ms at 1024 envs).
    Returns a batched AoS Contact (B leading) for the downstream stages.
    """
    s = m.spec
    dtype = kin.geom_xpos.dtype
    B = kin.geom_xpos.shape[0]

    gx = jnp.transpose(kin.geom_xpos, (2, 1, 0))      # (3, ngeom, B)
    gm = jnp.transpose(kin.geom_xmat, (2, 3, 1, 0))   # (3, 3, ngeom, B)
    if size_batched:
        size_bm = jnp.transpose(m.geom_size, (2, 1, 0))  # (3, ngeom, B)
    else:
        size_bm = m.geom_size.T                          # (3, ngeom)

    gt = s.geom_type
    groups = []
    for pid in range(s.npair):
        key = (int(gt[s.pair_geom1[pid]]), int(gt[s.pair_geom2[pid]]))
        if groups and groups[-1][0] == key:
            groups[-1][1].append(pid)
        else:
            groups.append((key, [pid]))

    chunks_d, chunks_p, chunks_n = [], [], []
    for key, pids in groups:
        fn, maxcon = _FNS[key]
        P = len(pids)
        pids_np = np.asarray(pids, dtype=np.int32)
        g1 = s.pair_geom1[pids_np]
        g2 = s.pair_geom2[pids_np]
        xp1, xp2 = gx[:, g1, :], gx[:, g2, :]          # (3, P, B)
        xm1, xm2 = gm[:, :, g1, :], gm[:, :, g2, :]    # (3, 3, P, B)
        if size_batched:
            s1, s2 = size_bm[:, g1, :], size_bm[:, g2, :]
            sz_in = -1
        else:
            s1, s2 = size_bm[:, g1], size_bm[:, g2]    # (3, P)
            sz_in = None
        marg = m.pair_margin[pids_np]                  # (P,)

        inner = jax.vmap(fn, in_axes=(-1,) * 7, out_axes=-1)   # over P
        outer = jax.vmap(inner,
                         in_axes=(-1, -1, sz_in, -1, -1, sz_in, None),
                         out_axes=-1)                          # over B
        d_g, p_g, n_g = outer(xp1, xm1, s1, xp2, xm2, s2, marg)
        # d_g (C, P, B); p_g/n_g (C, 3, P, B) -> slot-major batch-minor
        C = d_g.shape[0]
        chunks_d.append(jnp.transpose(d_g, (1, 0, 2))
                        .reshape(P * C, B).astype(dtype))
        chunks_p.append(jnp.transpose(p_g, (1, 2, 0, 3))
                        .reshape(3, P * C, B).astype(dtype))
        chunks_n.append(jnp.transpose(n_g, (1, 2, 0, 3))
                        .reshape(3, P * C, B).astype(dtype))

    dist_bm = jnp.concatenate(chunks_d, axis=0)        # (S, B)
    pos_bm = jnp.concatenate(chunks_p, axis=1)         # (3, S, B)
    nrm_bm = jnp.concatenate(chunks_n, axis=1)
    assert dist_bm.shape[0] == s.ncon_cap

    margin = jnp.asarray(m.pair_margin)[np.asarray(s.con_pairid)]
    active_bm = dist_bm < margin[:, None]

    # Back to AoS for the downstream (rows/solver) stages; the contact
    # frame is built post-compaction on the <= ncmax selected normals.
    return Contact(
        dist=dist_bm.T,
        pos=jnp.transpose(pos_bm, (2, 1, 0)),
        nrm=jnp.transpose(nrm_bm, (2, 1, 0)),
        active=active_bm.T,
    )


_CV_CACHE = {}


def _make_collide_cv(ncmax: int):
    from jax import custom_batching

    @custom_batching.custom_vmap
    def _collide(m, kin):
        con = narrowphase_all(m, kin)
        return con, compact(m, con, ncmax)

    @_collide.def_vmap
    def _collide_vmap(axis_size, in_batched, m, kin):
        # Leaves that don't trace-depend on the mapped axis arrive
        # unbatched (e.g. inside reset(): qpos is the shared qpos0, so
        # geom_xmat is constant across envs while geom_xpos varies with
        # the randomized board height) — broadcast them.
        kb = in_batched[1]
        if not kb.geom_xpos:
            kin = kin._replace(geom_xpos=jnp.broadcast_to(
                kin.geom_xpos, (axis_size,) + kin.geom_xpos.shape))
        if not kb.geom_xmat:
            kin = kin._replace(geom_xmat=jnp.broadcast_to(
                kin.geom_xmat, (axis_size,) + kin.geom_xmat.shape))
        size_batched = bool(in_batched[0].geom_size)
        con = _narrowphase_all_batched(m, kin, size_batched)
        cc = _compact_batched(m, con, ncmax)
        out_batched = (Contact(dist=True, pos=True, nrm=True,
                               active=True),
                       CompactContacts(pairid=True, dist=True, pos=True,
                                       frame=True, active=True, geom1=True,
                                       geom2=True, condim=True))
        return (con, cc), out_batched

    return _collide


def collide(m: Model, kin: Kin, ncmax: int):
    """Narrowphase + compaction.  Under one level of vmap the custom
    batching rule reroutes to the batch-minor implementation."""
    if ncmax not in _CV_CACHE:
        _CV_CACHE[ncmax] = _make_collide_cv(ncmax)
    return _CV_CACHE[ncmax](m, kin)
