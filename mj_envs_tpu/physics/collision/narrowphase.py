"""Analytic narrowphase for the primitive pairs of the Adroit suite.

Scalar-signature functions (one pair -> fixed number of contact candidates),
vmapped over the static candidate-pair axis by the collision driver and over
envs by the caller.  Conventions match mujoco:

* pairs are type-sorted (type1 <= type2, plane < sphere < capsule <
  cylinder < box);
* the contact normal points from geom1 toward geom2;
* ``dist`` is the signed surface separation (negative = penetration);
* ``pos`` is the midpoint between the two surfaces;
* inactive candidate slots report dist = +BIG.

Exactness tiers (validated in tests/test_collision_parity.py):
  exact vs mujoco 3.x  — plane-*, sphere-*, capsule-capsule;
  near-exact           — capsule-box, box-box (same algorithm family);
  approximate          — cylinder convex pairs (mujoco 2.1 used single-point
                         MPR via libccd, 3.x uses multicontact native CCD;
                         we use specialized analytic routines instead).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

BIG = 1e10


def _mm(a, b):
    """Tiny-matrix matmul via broadcast-multiply-reduce.  Batched
    `dot_general` on 3x3s fails to lower in Pallas/Mosaic (and gains
    nothing on the MXU at this size) — this form vectorizes on the VPU
    under any vmap nesting."""
    return jnp.sum(a[..., :, :, None] * b[..., None, :, :], axis=-2)


def _mv(a, v):
    """Tiny matrix @ vector, same rationale as _mm."""
    return jnp.sum(a * v[..., None, :], axis=-1)


def _iota1(n, dtype=jnp.int32):
    """1-D iota without materializing a constant array (Pallas kernels
    reject captured consts; TPU rejects 1-D lax.iota)."""
    return jax.lax.broadcasted_iota(dtype, (n, 1), 0)[:, 0]


def _oh(i, n, dtype):
    """One-hot vector for a traced index — gather-free dynamic select."""
    return (_iota1(n) == i).astype(dtype)


def _sel(tab, i):
    """tab[i] along axis 0 for traced scalar i, via one-hot reduction
    (Mosaic only lowers 2-D gathers)."""
    oh = _oh(i, tab.shape[0], tab.dtype)
    return jnp.sum(tab * oh.reshape((tab.shape[0],)
                                    + (1,) * (tab.ndim - 1)), axis=0)


def _basis(k, dtype):
    """Static standard basis vector e_k without a constant array."""
    return (_iota1(3) == k).astype(dtype)


def _eye3(dtype):
    return (jax.lax.broadcasted_iota(jnp.int32, (3, 3), 0)
            == jax.lax.broadcasted_iota(jnp.int32, (3, 3), 1)).astype(dtype)


def _cross(a, b):
    """Cross product without jnp.cross (whose take-based implementation
    becomes a >2-D gather under vmap, unsupported in Pallas/Mosaic)."""
    ax, ay, az = a[..., 0], a[..., 1], a[..., 2]
    bx, by, bz = b[..., 0], b[..., 1], b[..., 2]
    return jnp.stack([ay * bz - az * by,
                      az * bx - ax * bz,
                      ax * by - ay * bx], axis=-1)


def _vdot(a, b):
    """Vector dot product; jnp.dot becomes a batched `dot_general`
    under vmap, which Pallas/Mosaic cannot lower."""
    return jnp.sum(a * b, axis=-1)


def _midpos(p_on_1, p_on_2):
    return 0.5 * (p_on_1 + p_on_2)


def _safe_normalize(v, fallback=None, eps=1e-12):
    n = jnp.linalg.norm(v)
    if fallback is None:
        fallback = _basis(2, v.dtype)
    return jnp.where(n > eps, v / jnp.maximum(n, eps), fallback), n


# ---------------------------------------------------------------------------
# plane-X   (plane normal = column 2 of its frame; surface through pos1)
# ---------------------------------------------------------------------------

def plane_sphere(p1, m1, s1, p2, m2, s2, margin=0.0):
    n = m1[:, 2]
    r = s2[0]
    h = _vdot(n, p2 - p1)
    dist = h - r
    pos = p2 - n * (r + 0.5 * dist)
    return dist[None], pos[None], n[None]


def plane_capsule(p1, m1, s1, p2, m2, s2, margin=0.0):
    n = m1[:, 2]
    axis = m2[:, 2]
    r, hl = s2[0], s2[1]
    ends = jnp.stack([p2 + axis * hl, p2 - axis * hl])
    h = _mv(ends, n) - _vdot(p1, n)
    dist = h - r
    pos = ends - n[None, :] * (r + 0.5 * dist)[:, None]
    return dist, pos, jnp.stack([n, n])


def plane_cylinder(p1, m1, s1, p2, m2, s2, margin=0.0):
    """Up to 4 candidates, mirroring mujoco 3.x mjc_PlaneCylinder:
    deepest rim point of the near cap, two near-cap rim points at +-120deg,
    and the far-cap rim point at the deepest azimuth.  When the axis is
    (near-)normal to the plane the three 120deg points form the standing
    tripod."""
    n = m1[:, 2]
    axis = m2[:, 2]
    r, hl = s2[0], s2[1]
    dtype = p1.dtype

    ca = _vdot(n, axis)
    # Radial direction of steepest descent on the cap rim.
    prj = axis * ca - n
    prjn = jnp.linalg.norm(prj)
    standing = prjn < 1e-10
    # Arbitrary tangent when standing.
    t_arb = m2[:, 0]
    rad = jnp.where(standing, t_arb, prj / jnp.maximum(prjn, 1e-12))

    near_sign = -jnp.sign(ca + jnp.where(jnp.abs(ca) < 1e-12, 1.0, 0.0))
    # near cap center: choose the cap whose center is lower along n.
    cap = p2 + axis * hl * jnp.where(ca < 0, 1.0, -1.0)
    far_cap = 2.0 * p2 - cap

    # Orthonormal tangent in the rim plane for the 120deg points.
    t2v = _cross(axis, rad)

    c120, s120 = -0.5, jnp.sqrt(jnp.asarray(3.0, dtype=dtype)) / 2.0
    pts = jnp.stack([
        cap + r * rad,
        cap + r * (c120 * rad + s120 * t2v),
        cap + r * (c120 * rad - s120 * t2v),
        far_cap + r * rad,
    ])
    h = _mv(pts, n) - _vdot(p1, n)
    dist = h
    pos = pts - n[None, :] * (0.5 * dist)[:, None]
    nrm = jnp.broadcast_to(n, (4, 3))
    # Mark the far-cap point inactive when it coincides with a near point
    # (standing case: far cap is the top rim, normally above margin anyway).
    return dist, pos, nrm


def plane_box(p1, m1, s1, p2, m2, s2, margin=0.0):
    """All 8 corners; driver keeps the (up to) 4 deepest active ones."""
    n = m1[:, 2]
    bits = jax.lax.broadcasted_iota(jnp.int32, (8, 3), 0)
    shift = jax.lax.broadcasted_iota(jnp.int32, (8, 3), 1)
    signs = (2 * ((bits // (4 // (2 ** shift).astype(jnp.int32)
                            ).astype(jnp.int32)) % 2) - 1).astype(p1.dtype)
    corners = p2[None, :] + _mm(signs * s2[None, :], m2.T)
    dist = _mv(corners, n) - _vdot(p1, n)
    pos = corners - n[None, :] * (0.5 * dist)[:, None]
    nrm = jnp.broadcast_to(n, (8, 3))
    return dist, pos, nrm


# ---------------------------------------------------------------------------
# sphere-X
# ---------------------------------------------------------------------------

def sphere_sphere(p1, m1, s1, p2, m2, s2, margin=0.0):
    d = p2 - p1
    n, ln = _safe_normalize(d)
    dist = ln - s1[0] - s2[0]
    pos = _midpos(p1 + n * s1[0], p2 - n * s2[0])
    return dist[None], pos[None], n[None]


def _closest_on_segment(a, b, p):
    ab = b - a
    t = jnp.clip(_vdot(p - a, ab) / jnp.maximum(_vdot(ab, ab), 1e-15),
                 0.0, 1.0)
    return a + t * ab


def sphere_capsule(p1, m1, s1, p2, m2, s2, margin=0.0):
    axis = m2[:, 2]
    hl = s2[1]
    c = _closest_on_segment(p2 - axis * hl, p2 + axis * hl, p1)
    d = c - p1
    n, ln = _safe_normalize(d)
    dist = ln - s1[0] - s2[0]
    pos = _midpos(p1 + n * s1[0], c - n * s2[0])
    return dist[None], pos[None], n[None]


def _closest_on_cylinder_surface(p, c, axis, r, hl):
    """Closest point on a solid cylinder's surface to external point p, and
    the outward normal there.  For interior points returns the minimal
    push-out face/side point."""
    rel = p - c
    z = _vdot(rel, axis)
    radial = rel - z * axis
    rn = jnp.linalg.norm(radial)
    rdir = jnp.where(rn > 1e-12, radial / jnp.maximum(rn, 1e-12),
                     _ortho(axis))
    inside = (jnp.abs(z) <= hl) & (rn <= r)

    # Outside: clamp.
    zc = jnp.clip(z, -hl, hl)
    rc = jnp.minimum(rn, r)
    surf_out = c + axis * zc + rdir * jnp.where(
        (jnp.abs(z) > hl) & (rn <= r), rc, r * 0 + jnp.minimum(rn, r))
    # simpler: clamp radius to r when beyond side, keep rn when above cap
    surf_out = c + axis * zc + rdir * jnp.minimum(rn, r)

    # Inside: push to nearest feature (side vs cap).
    d_side = r - rn
    d_cap = hl - jnp.abs(z)
    use_side = d_side <= d_cap
    surf_in = jnp.where(
        use_side,
        c + axis * z + rdir * r,
        c + axis * jnp.sign(z + 1e-30) * hl + rdir * rn,
    )
    surf = jnp.where(inside, surf_in, surf_out)
    return surf, inside


def _ortho(v):
    """Any unit vector orthogonal to unit v."""
    other = jnp.where(jnp.abs(v[0]) < 0.5, _basis(0, v.dtype),
                      _basis(1, v.dtype))
    w = _cross(v, other)
    return w / jnp.linalg.norm(w)


def sphere_cylinder(p1, m1, s1, p2, m2, s2, margin=0.0):
    axis = m2[:, 2]
    r2, hl = s2[0], s2[1]
    surf, inside = _closest_on_cylinder_surface(p1, p2, axis, r2, hl)
    d = surf - p1
    ln = jnp.linalg.norm(d)
    n_out = jnp.where(ln > 1e-12, d / jnp.maximum(ln, 1e-12),
                      _ortho(axis))
    # normal points from sphere (geom1) toward cylinder (geom2)
    n = jnp.where(inside, -n_out, n_out)
    dist = jnp.where(inside, -ln, ln) - s1[0]
    pos = _midpos(p1 + n * s1[0], surf)
    return dist[None], pos[None], n[None]


def _closest_on_box(p, c, m, size):
    """Closest point on solid box surface to p (world), outward normal-ish
    direction handled by caller; also returns whether p is inside."""
    lp = _mv(m.T, p - c)
    clamped = jnp.clip(lp, -size, size)
    inside = jnp.all(jnp.abs(lp) <= size)
    # Inside: project to nearest face.
    gap = size - jnp.abs(lp)
    k = jnp.argmin(gap)
    ohk = _oh(k, 3, lp.dtype)
    lpk = _vdot(lp, ohk)
    szk = _vdot(size, ohk)
    proj = clamped * (1.0 - ohk) + ohk * jnp.sign(lpk + 1e-30) * szk
    lsurf = jnp.where(inside, proj, clamped)
    return c + _mv(m, lsurf), inside


def sphere_box(p1, m1, s1, p2, m2, s2, margin=0.0):
    surf, inside = _closest_on_box(p1, p2, m2, s2)
    d = surf - p1
    ln = jnp.linalg.norm(d)
    n_out = jnp.where(ln > 1e-12, d / jnp.maximum(ln, 1e-12),
                      _basis(2, p1.dtype))
    n = jnp.where(inside, -n_out, n_out)
    dist = jnp.where(inside, -ln, ln) - s1[0]
    pos = _midpos(p1 + n * s1[0], surf)
    return dist[None], pos[None], n[None]


# ---------------------------------------------------------------------------
# capsule-X
# ---------------------------------------------------------------------------

def _segment_closest(a1, b1, a2, b2):
    """Closest points between segments [a1,b1], [a2,b2] (clamped), plus the
    parallelism measure."""
    d1 = b1 - a1
    d2 = b2 - a2
    r = a1 - a2
    A = _vdot(d1, d1)
    e = _vdot(d2, d2)
    f = _vdot(d2, r)
    c = _vdot(d1, r)
    b = _vdot(d1, d2)
    denom = A * e - b * b
    s = jnp.where(denom > 1e-14, jnp.clip((b * f - c * e) / jnp.maximum(
        denom, 1e-14), 0.0, 1.0), 0.0)
    t = (b * s + f) / jnp.maximum(e, 1e-14)
    t_cl = jnp.clip(t, 0.0, 1.0)
    s2c = jnp.clip((b * t_cl - c) / jnp.maximum(A, 1e-14), 0.0, 1.0)
    p1 = a1 + d1 * s2c
    p2c = a2 + d2 * t_cl
    parallel = denom <= 1e-10 * A * e
    return p1, p2c, parallel


def capsule_capsule(p1, m1, s1, p2, m2, s2, margin=0.0):
    """2 candidates: the generic closest-point contact, plus a second
    contact when the capsules are (near-)parallel, at the other end of the
    overlap interval (mujoco mjc_CapsuleCapsule behavior)."""
    r1, h1 = s1[0], s1[1]
    r2, h2 = s2[0], s2[1]
    ax1, ax2 = m1[:, 2], m2[:, 2]
    a1, b1 = p1 - ax1 * h1, p1 + ax1 * h1
    a2, b2 = p2 - ax2 * h2, p2 + ax2 * h2

    c1, c2, parallel = _segment_closest(a1, b1, a2, b2)
    d = c2 - c1
    n, ln = _safe_normalize(d, fallback=_ortho(ax1))
    dist_a = ln - r1 - r2
    pos_a = _midpos(c1 + n * r1, c2 - n * r2)

    # Parallel second contact: project seg2 onto seg1's line, use the other
    # end of the overlapping interval.
    t_a2 = _vdot(a2 - a1, ax1)
    t_b2 = _vdot(b2 - a1, ax1)
    lo = jnp.maximum(0.0, jnp.minimum(t_a2, t_b2))
    hi = jnp.minimum(2.0 * h1, jnp.maximum(t_a2, t_b2))
    t_first = _vdot(c1 - a1, ax1)
    # Pick the overlap end farther from the first contact.
    t_other = jnp.where(jnp.abs(t_first - lo) > jnp.abs(t_first - hi),
                        lo, hi)
    c1b = a1 + ax1 * t_other
    # Corresponding closest point on seg2.
    c2b = _closest_on_segment(a2, b2, c1b)
    db = c2b - c1b
    nb, lnb = _safe_normalize(db, fallback=n)
    dist_b = lnb - r1 - r2
    pos_b = _midpos(c1b + nb * r1, c2b - nb * r2)

    has_overlap = hi > lo
    valid_b = parallel & has_overlap & (jnp.abs(t_other - t_first) > 1e-9)
    dist_b = jnp.where(valid_b, dist_b, BIG)

    return (jnp.stack([dist_a, dist_b]), jnp.stack([pos_a, pos_b]),
            jnp.stack([n, nb]))


def _sphere_point_box(pt_w, r, p2, m2, s2):
    """Sphere of radius r centered at pt_w vs box: (dist, pos, n)."""
    surf, inside = _closest_on_box(pt_w, p2, m2, s2)
    d = surf - pt_w
    ln = jnp.linalg.norm(d)
    n = jnp.where(ln > 1e-12, d / jnp.maximum(ln, 1e-12),
                  _basis(2, pt_w.dtype))
    n = jnp.where(inside, -n, n)
    dist = jnp.where(inside, -ln, ln) - r
    pos = _midpos(pt_w + n * r, surf)
    return dist, pos, n


def capsule_box(p1, m1, s1, p2, m2, s2, margin=0.0):
    """Capsule (geom1) vs box (geom2): up to 2 contacts.

    Mirrors the observed mujoco mjc_CapsuleBox manifold: pick the box face
    supporting the capsule center, clip the axis segment against that
    face's rectangle (the two in-face dims of the *uninflated* box), and
    emit a sphere-box contact with its true signed distance at each clip
    endpoint — the shallow end is then dropped by the driver's margin
    filter, exactly as observed in the oracle (tilt sweep: 2 contacts with
    real distances while the shallow end is within margin, 1 beyond).  If
    the clip interval is empty (edge/corner regime) or the segment misses
    the box inflated by r, the single closest-point contact is emitted."""
    r, hl = s1[0], s1[1]
    ax = m1[:, 2]
    a = p1 - ax * hl
    b = p1 + ax * hl

    # Work in box frame.
    al = _mv(m2.T, a - p2)
    bl = _mv(m2.T, b - p2)
    dl = bl - al

    # Supporting face: the dim where the (scaled) center offset is largest.
    rel_l = _mv(m2.T, p1 - p2)
    kf = jnp.argmax(jnp.abs(rel_l) / s2)

    t_lo = jnp.asarray(0.0, p1.dtype)
    t_hi = jnp.asarray(1.0, p1.dtype)
    miss = jnp.asarray(False)
    for k in range(3):
        dk = dl[k]
        is_face = kf == k
        parallel_k = jnp.abs(dk) < 1e-13
        safe = jnp.where(parallel_k, 1.0, dk)
        t1 = (-s2[k] - al[k]) / safe
        t2 = (s2[k] - al[k]) / safe
        skip = is_face | parallel_k
        t_lo = jnp.where(skip, t_lo,
                         jnp.maximum(t_lo, jnp.minimum(t1, t2)))
        t_hi = jnp.where(skip, t_hi,
                         jnp.minimum(t_hi, jnp.maximum(t1, t2)))
        miss = miss | (parallel_k & ~is_face
                       & (jnp.abs(al[k]) > s2[k] + r))
    miss = miss | (t_lo > t_hi)

    t_a = jnp.clip(jnp.asarray(0.0, p1.dtype), t_lo, t_hi)
    t_b = jnp.clip(jnp.asarray(1.0, p1.dtype), t_lo, t_hi)

    # Fallback for a miss: exact closest point of the segment to the box
    # (fixed-point of t -> clamp projection; convex, converges) so margin
    # inclusion still works.
    def fp_body(_, t):
        pt = al + t * dl
        cl = jnp.clip(pt, -s2, s2)
        return jnp.clip(_vdot(cl - al, dl)
                        / jnp.maximum(_vdot(dl, dl), 1e-15), 0.0, 1.0)

    t_fp = jax.lax.fori_loop(0, 12, fp_body,
                             jnp.asarray(0.5, p1.dtype))
    t_a = jnp.where(miss, t_fp, t_a)

    pa_w = p2 + _mv(m2, al + t_a * dl)
    pb_w = p2 + _mv(m2, al + t_b * dl)
    dist_a, pos_a, n_a = _sphere_point_box(pa_w, r, p2, m2, s2)
    dist_b, pos_b, n_b = _sphere_point_box(pb_w, r, p2, m2, s2)
    dist_b = jnp.where(miss, BIG, dist_b)

    # When neither clip endpoint reaches the margin (e.g. the segment
    # crosses an edge/corner region with the deep point interior), fall
    # back to the single closest-point contact.
    pf2_w = p2 + _mv(m2, al + t_fp * dl)
    dist_f, pos_f, n_f = _sphere_point_box(pf2_w, r, p2, m2, s2)
    neither = (dist_a >= margin) & (dist_b >= margin)
    use_fb = miss | neither
    dist_a = jnp.where(use_fb, dist_f, dist_a)
    pos_a = jnp.where(use_fb, pos_f, pos_a)
    n_a = jnp.where(use_fb, n_f, n_a)
    dist_b = jnp.where(use_fb, BIG, dist_b)

    return (jnp.stack([dist_a, dist_b]), jnp.stack([pos_a, pos_b]),
            jnp.stack([n_a, n_b]))


# ---------------------------------------------------------------------------
# cylinder pairs (approximate analytic; see module docstring)
# ---------------------------------------------------------------------------

def capsule_cylinder(p1, m1, s1, p2, m2, s2, margin=0.0):
    """Capsule (geom1) vs cylinder (geom2): up to 2 contacts.  The capsule
    segment's closest point to the solid cylinder is found by sampled+
    refined minimization; a parallel-contact second point handles the
    lying case."""
    r1, h1 = s1[0], s1[1]
    ax1 = m1[:, 2]
    a = p1 - ax1 * h1
    b = p1 + ax1 * h1
    ax2 = m2[:, 2]
    r2, h2 = s2[0], s2[1]

    def point_dist(t):
        pt = a + t * (b - a)
        surf, inside = _closest_on_cylinder_surface(pt, p2, ax2, r2, h2)
        d = surf - pt
        ln = jnp.linalg.norm(d)
        return jnp.where(inside, -ln, ln), pt, surf

    # Coarse sample + golden-section refine on the (piecewise-smooth) 1D
    # distance; robust for the task geometries.
    ts = _iota1(17).astype(p1.dtype) / 16.0
    dists = jax.vmap(lambda t: point_dist(t)[0])(ts)
    i = jnp.argmin(dists)
    t_i = _vdot(ts, _oh(i, 17, ts.dtype))
    lo = jnp.clip(t_i - 1.0 / 16.0, 0.0, 1.0)
    hi = jnp.clip(t_i + 1.0 / 16.0, 0.0, 1.0)
    gr = 0.618033988749895

    def gs_body(_, lh):
        lo, hi = lh
        m_lo = hi - gr * (hi - lo)
        m_hi = lo + gr * (hi - lo)
        f_lo = point_dist(m_lo)[0]
        f_hi = point_dist(m_hi)[0]
        return (jnp.where(f_lo < f_hi, lo, m_lo),
                jnp.where(f_lo < f_hi, m_hi, hi))

    lo, hi = jax.lax.fori_loop(0, GS_ITERS, gs_body, (lo, hi))
    t_best = 0.5 * (lo + hi)
    dmin, pt, surf = point_dist(t_best)
    dvec = surf - pt
    ln = jnp.linalg.norm(dvec)
    n_out = jnp.where(ln > 1e-12, dvec / jnp.maximum(ln, 1e-12),
                      _ortho(ax2))
    n = jnp.where(dmin < 0, -n_out, n_out)
    dist_a = dmin - r1
    pos_a = _midpos(pt + n * r1, surf)

    # Parallel (capsule lying along cylinder side or across the cap).
    parallel = jnp.abs(_vdot(ax1, ax2)) > 0.999
    t_other = jnp.where(t_best < 0.5, 1.0, 0.0)
    d2, pt2, surf2 = point_dist(t_other)
    d2vec = surf2 - pt2
    ln2 = jnp.linalg.norm(d2vec)
    n2 = jnp.where(ln2 > 1e-12, d2vec / jnp.maximum(ln2, 1e-12), n)
    n2 = jnp.where(d2 < 0, -n2, n2)
    dist_b = jnp.where(parallel, d2 - r1, BIG)
    pos_b = _midpos(pt2 + n2 * r1, surf2)

    return (jnp.stack([dist_a, dist_b]), jnp.stack([pos_a, pos_b]),
            jnp.stack([n, n2]))


def cylinder_cylinder(p1, m1, s1, p2, m2, s2, margin=0.0):
    """Cylinder-cylinder, specialized for the suite's dominant regimes:

    * cap-cap (axes near-parallel, axial stacking — hammer face on nail
      head): ring contact approximated by 3 points at 120 deg on the
      overlap circle + a center point;
    * side-side parallel: 2 points along the contact line;
    * generic: single contact from segment-segment closest points treated
      as locally spherical.

    Reference behavior (mujoco-py 2.1) produced a single MPR contact here;
    this routine is intentionally a stable superset.  4 candidates.
    """
    r1, h1 = s1[0], s1[1]
    ax1 = m1[:, 2]
    r2, h2 = s2[0], s2[1]
    ax2 = m2[:, 2]
    dtype = p1.dtype

    ca = _vdot(ax1, ax2)
    parallel = jnp.abs(ca) > 0.999

    rel = p2 - p1
    z = _vdot(rel, ax1)                       # axial offset
    radial = rel - z * ax1
    rn = jnp.linalg.norm(radial)
    rdir = jnp.where(rn > 1e-12, radial / jnp.maximum(rn, 1e-12),
                     _ortho(ax1))

    # --- parallel cases --------------------------------------------------
    axial_gap = jnp.abs(z) - (h1 + h2)
    radial_gap = rn - (r1 + r2)
    cap_case = parallel & (rn < jnp.maximum(r1, r2))

    # cap-cap: contact plane halfway between facing caps.
    sgn = jnp.sign(z + 1e-30)
    cap1 = p1 + ax1 * sgn * h1
    n_cc = ax1 * sgn                             # from geom1 toward geom2
    ring_r = jnp.minimum(r1, r2)
    t1v = _ortho(ax1)
    t2v = _cross(ax1, t1v)
    center = cap1 + n_cc * 0.5 * axial_gap
    # ring center offset toward the smaller cylinder's axis
    ring_c = jnp.where(r1 < r2, p1 + n_cc * (h1 + 0.5 * axial_gap),
                       p2 - n_cc * (h2 + 0.5 * axial_gap))
    c120, s120 = -0.5, jnp.sqrt(jnp.asarray(3.0, dtype=dtype)) / 2.0
    ring_pts = jnp.stack([
        ring_c + ring_r * t1v,
        ring_c + ring_r * (c120 * t1v + s120 * t2v),
        ring_c + ring_r * (c120 * t1v - s120 * t2v),
        ring_c,
    ])
    dist_cc = jnp.broadcast_to(axial_gap, (4,))
    pos_cc = ring_pts
    n_cc4 = jnp.broadcast_to(n_cc, (4, 3))

    # side-side parallel: two points along overlap of axes.
    n_ss = rdir
    z2lo = z - h2
    z2hi = z + h2
    lo = jnp.maximum(-h1, jnp.minimum(z2lo, z2hi))
    hi = jnp.minimum(h1, jnp.maximum(z2lo, z2hi))
    mid = 0.5 * (lo + hi)
    pts_ax = jnp.stack([lo, hi, mid, mid])
    surf1 = p1[None, :] + pts_ax[:, None] * ax1[None, :] \
        + n_ss[None, :] * r1
    surf2 = surf1 + n_ss[None, :] * radial_gap[None]
    pos_ss = 0.5 * (surf1 + surf2)
    dist_ss = jnp.stack([radial_gap, radial_gap, BIG, BIG])
    n_ss4 = jnp.broadcast_to(n_ss, (4, 3))
    ss_valid = hi > lo

    # --- generic: alternating-projection closest points between the two
    # (shrunken) solids; exact in the shallow-contact regime.
    a1, b1 = p1 - ax1 * h1, p1 + ax1 * h1
    a2, b2 = p2 - ax2 * h2, p2 + ax2 * h2
    c1, c2, _ = _segment_closest(a1, b1, a2, b2)
    shrink = 0.3 * jnp.minimum(jnp.minimum(r1, h1), jnp.minimum(r2, h2))
    # Multi-start directions for the support-gap ascent: both axes, the
    # inter-axis radial, their cross — covers face, side and rim escapes
    # (the AP seed alone picks the wrong face for rim-into-thin-disc).
    cr = _safe_unit(_cross(ax1, ax2), rdir)
    cands = jnp.stack([rdir, -rdir, ax1, -ax1, ax2, -ax2, cr, -cr])
    dist_g, pos_g, n_g = _convex_contact(
        lambda x: _proj_cyl_solid(x, p1, ax1, r1 - shrink, h1 - shrink),
        lambda x: _proj_cyl_solid(x, p2, ax2, r2 - shrink, h2 - shrink),
        0.5 * (c1 + c2), shrink, fallback_n=rdir,
        suppA=lambda d: _supp_cyl(d, p1, ax1, r1, h1),
        suppB=lambda d: _supp_cyl(d, p2, ax2, r2, h2),
        cand_dirs=cands,
        suppPA=lambda d, ref: _supp_point_cyl(d, p1, ax1, r1, h1, ref),
        suppPB=lambda d, ref: _supp_point_cyl(d, p2, ax2, r2, h2, ref))
    dist_g4 = jnp.stack([dist_g, BIG, BIG, BIG])
    pos_g4 = jnp.broadcast_to(pos_g, (4, 3))
    n_g4 = jnp.broadcast_to(n_g, (4, 3))

    side_case = parallel & ~cap_case & ss_valid
    dist = jnp.where(cap_case, dist_cc,
                     jnp.where(side_case, dist_ss, dist_g4))
    pos = jnp.where(cap_case, pos_cc,
                    jnp.where(side_case, pos_ss, pos_g4))
    nrm = jnp.where(cap_case, n_cc4,
                    jnp.where(side_case, n_ss4, n_g4))
    return dist, pos, nrm


def cylinder_box(p1, m1, s1, p2, m2, s2, margin=0.0):
    """Cylinder (geom1) vs box (geom2): 4 candidates.

    Regimes: cap-on-face (standing) -> 3 rim points like plane_cylinder
    against the face plane; side-on-face (lying) -> 2 points along the
    contact line; generic -> closest point of the cylinder's axis segment
    to the box, treated locally as a capsule contact."""
    r, hl = s1[0], s1[1]
    ax = m1[:, 2]
    dtype = p1.dtype

    # Find the box face whose outward normal is most opposed to the
    # cylinder center direction (candidate supporting face).
    rel_l = _mv(m2.T, p1 - p2)
    k = jnp.argmax(jnp.abs(rel_l) / s2)
    ohk = _oh(k, 3, dtype)
    sgn = jnp.sign(_vdot(rel_l, ohk) + 1e-30)
    face_n = _mv(m2, ohk * sgn)                           # outward
    face_c = p2 + face_n * _vdot(s2, ohk)

    ca = _vdot(face_n, ax)
    standing = jnp.abs(ca) > 0.999
    lying = jnp.abs(ca) < 1e-3

    # --- cap-on-face: reuse plane-cylinder against the face plane, then
    # clamp the points into the face rectangle.  Only valid when the
    # cylinder actually hovers over the face rectangle (center's in-face
    # coords within bounds inflated by r) — otherwise the infinite face
    # plane would report phantom penetration for cylinders standing
    # *beside* the box.
    in_face = _iota1(3) != k
    stand_valid = jnp.all(
        jnp.where(in_face, jnp.abs(rel_l) <= s2 + r, True))
    dists_pc, pos_pc, _ = plane_cylinder(face_c, _frame_from_z(face_n),
                                         s2, p1, m1, s1)
    # Clamp positions into the face bounds (in box frame).
    pos_l = jax.vmap(lambda q: _mv(m2.T, q - p2))(pos_pc)
    pos_l_cl = jnp.stack([
        jnp.where(_iota1(3) == k, pos_l[i],
                  jnp.clip(pos_l[i], -s2, s2))
        for i in range(4)
    ])
    pos_cf = jax.vmap(lambda q: p2 + _mv(m2, q))(pos_l_cl)
    n_cf = jnp.broadcast_to(-face_n, (4, 3))  # from cylinder toward box

    # --- lying: 2-point line contact against the face.  The axis segment
    # (projected into the box frame) is clipped against the face
    # rectangle; an empty clip means the cylinder lies *beside* the box
    # (no face contact — the generic branch takes over).  The oracle's
    # native-CCD face manifold reports the SAME (deepest) signed distance
    # for every polygon point — observed on the settled hammer head — so
    # the shared deepest distance is used for both points.
    a = p1 - ax * hl
    b = p1 + ax * hl
    al = _mv(m2.T, a - p2)
    bl = _mv(m2.T, b - p2)
    dl2 = bl - al
    t_lo = jnp.asarray(0.0, dtype)
    t_hi = jnp.asarray(1.0, dtype)
    ly_ok = jnp.asarray(True)
    for dim in range(3):
        is_face = k == dim
        par = jnp.abs(dl2[dim]) < 1e-12
        safe = jnp.where(par, 1.0, dl2[dim])
        t1 = (-s2[dim] - al[dim]) / safe
        t2 = (s2[dim] - al[dim]) / safe
        skip = is_face | par
        t_lo = jnp.where(skip, t_lo,
                         jnp.maximum(t_lo, jnp.minimum(t1, t2)))
        t_hi = jnp.where(skip, t_hi,
                         jnp.minimum(t_hi, jnp.maximum(t1, t2)))
        ly_ok = ly_ok & jnp.where(par & ~is_face,
                                  jnp.abs(al[dim]) <= s2[dim], True)
    ly_ok = ly_ok & (t_lo <= t_hi)
    pa = a + t_lo * (b - a)
    pb = b + (t_hi - 1.0) * (b - a)
    da = _vdot(pa - face_c, face_n) - r
    db = _vdot(pb - face_c, face_n) - r
    d_shared = jnp.minimum(da, db)
    pa = pa - face_n * (r + 0.5 * d_shared)
    pb = pb - face_n * (r + 0.5 * d_shared)
    dist_ly = jnp.stack([d_shared, d_shared, BIG, BIG])
    pos_ly = jnp.stack([pa, pb, pa, pb])
    n_ly = jnp.broadcast_to(-face_n, (4, 3))
    standing = standing & stand_valid
    lying = lying & ly_ok

    # --- generic: alternating projections between shrunken solids.
    shrink = 0.3 * jnp.minimum(jnp.minimum(r, hl), jnp.min(s2))
    rel_cb = _safe_unit(p2 - p1, -face_n)
    cands_cb = jnp.stack([
        rel_cb, -rel_cb, ax, -ax,
        m2[:, 0], -m2[:, 0], m2[:, 1], -m2[:, 1], m2[:, 2], -m2[:, 2]])
    dist_g, pos_g, n_g = _convex_contact(
        lambda x: _proj_cyl_solid(x, p1, ax, r - shrink, hl - shrink),
        lambda x: _proj_box_solid(x, p2, m2, s2 - shrink),
        0.5 * (p1 + p2), shrink, fallback_n=-face_n,
        suppA=lambda d: _supp_cyl(d, p1, ax, r, hl),
        suppB=lambda d: _supp_box(d, p2, m2, s2),
        cand_dirs=cands_cb,
        suppPA=lambda d, ref: _supp_point_cyl(d, p1, ax, r, hl, ref),
        suppPB=lambda d, ref: _supp_point_box(d, p2, m2, s2, ref))
    dist_g4 = jnp.stack([dist_g, BIG, BIG, BIG])
    pos_g4 = jnp.broadcast_to(pos_g, (4, 3))
    n_g4 = jnp.broadcast_to(n_g, (4, 3))

    dist = jnp.where(standing, dists_pc,
                     jnp.where(lying, dist_ly, dist_g4))
    pos = jnp.where(standing, pos_cf,
                    jnp.where(lying, pos_ly, pos_g4))
    nrm = jnp.where(standing, n_cf,
                    jnp.where(lying, n_ly, n_g4))
    return dist, pos, nrm


def _frame_from_z(z):
    x = _ortho(z)
    y = _cross(z, x)
    return jnp.stack([x, y, z], axis=1)


def _proj_cyl_solid(x, c, axis, r, hl):
    """Euclidean projection of x onto the solid cylinder (c, axis, r, hl)."""
    rel = x - c
    z = _vdot(rel, axis)
    rad = rel - z * axis
    rn = jnp.linalg.norm(rad)
    rdir = jnp.where(rn > 1e-12, rad / jnp.maximum(rn, 1e-12), _ortho(axis))
    return c + axis * jnp.clip(z, -hl, hl) + rdir * jnp.minimum(rn, r)


def _proj_box_solid(x, c, m, size):
    return c + _mv(m, jnp.clip(_mv(m.T, x - c), -size, size))


# Iteration budgets for the iterative convex paths (module-level so tests
# and profiling can tune them; values chosen to keep narrowphase parity
# within the dist-tier tolerances).
AP_ITERS = 48
POLISH_ITERS = 24
GS_ITERS = 24


def _convex_contact(projA, projB, x0, shrink, fallback_n, iters=None,
                    suppA=None, suppB=None, cand_dirs=None,
                    suppPA=None, suppPB=None):
    iters = AP_ITERS if iters is None else iters
    """Contact between two convex solids.

    Alternating projection on the pre-shrunk solids estimates the contact
    normal (robust but first-order slow); the signed distance is then
    recovered exactly from the *original* solids' support functions along
    that normal (the support gap equals the true distance at the optimal
    normal, and is second-order accurate in the normal error).  Penetration
    beyond 2*shrink saturates.  n points from solid A toward solid B.

    Once the solids overlap, the support gap has multiple local maxima
    over the sphere (e.g. a cylinder rim pressed laterally into a thin
    disc: the axial escape is a local max ~5x deeper than the true
    lateral one — exactly the failure that stalled hammer-v0's nail
    impacts).  `cand_dirs` (K, 3 unit rows) multi-starts the polish: the
    best of {AP direction} ∪ candidates by support gap seeds the ascent.
    When that winner decisively beats the AP direction, the returned
    position switches from the AP midpoint to the support-witness
    midpoint (`suppPA`/`suppPB`: support POINT maps of the unshrunk
    solids)."""
    def ap_body(_, xy):
        x, y = xy
        x = projA(y)
        y = projB(x)
        return (x, y)

    x, y = jax.lax.fori_loop(0, iters, ap_body, (x0, x0))
    d = y - x
    ln = jnp.linalg.norm(d)
    n = jnp.where(ln > 1e-10, d / jnp.maximum(ln, 1e-10), fallback_n)
    gap_ap = None
    if suppA is not None:
        # The signed distance equals max over unit directions of the
        # support gap; polish n by projected gradient ascent (the gradient
        # is the difference of support points), then evaluate the gap.
        sppA, sppB = suppA, suppB
        gap = lambda v: -sppB(-v) - sppA(v)
        gA_fn = jax.grad(sppA)
        gB_fn = jax.grad(lambda v: -spp_neg(sppB, v))

        gap_ap = gap(n)
        if cand_dirs is not None:
            gaps_c = jax.vmap(gap)(cand_dirs)          # (K,)
            g_best = jnp.max(gaps_c)
            n_cand = _sel(cand_dirs, jnp.argmax(gaps_c))
            cand_better = g_best > gap_ap
            n_start = jnp.where(cand_better, n_cand, n)
            gap_start = jnp.maximum(g_best, gap_ap)
        else:
            n_start, gap_start = n, gap_ap

        def polish_body(_, st):
            n, n_best, gap_best, step = st
            grad = gB_fn(n) - gA_fn(n)
            tang = grad - _vdot(grad, n) * n
            n_try = n + step * tang
            n_try = n_try / jnp.maximum(jnp.linalg.norm(n_try), 1e-12)
            g_try = gap(n_try)
            improved = g_try > gap_best
            n_best = jnp.where(improved, n_try, n_best)
            gap_best = jnp.where(improved, g_try, gap_best)
            n = jnp.where(improved, n_try, n)
            step = jnp.where(improved, step, step * 0.5)
            return (n, n_best, gap_best, step)

        st0 = (n_start, n_start, gap_start,
               jnp.asarray(0.25, n_start.dtype))
        _, n, dist, _ = jax.lax.fori_loop(0, POLISH_ITERS, polish_body, st0)
    else:
        dist = ln - 2.0 * shrink
    pos = 0.5 * (x + y) + 0.0 * n
    if gap_ap is not None and suppPA is not None:
        # AP converged to a worse direction than the multi-start winner:
        # its midpoint lies on the wrong face — use the support witnesses,
        # resolving degenerate support coordinates toward the AP midpoint.
        aw = suppPA(n, pos)
        bw = suppPB(-n, aw)
        aw = suppPA(n, bw)
        pos_w = 0.5 * (aw + bw)
        use_w = dist > gap_ap + 1e-7
        pos = jnp.where(use_w, pos_w, pos)
    return dist, pos, n


def spp_neg(supp, v):
    return supp(-v)


def _supp_cyl(d, c, axis, r, hl):
    """Support value of a solid cylinder along unit direction d."""
    za = _vdot(d, axis)
    perp = jnp.linalg.norm(d - za * axis)
    return _vdot(d, c) + hl * jnp.abs(za) + r * perp


def _supp_box(d, c, m, size):
    return _vdot(d, c) + _vdot(jnp.abs(_mv(m.T, d)), size)


def _supp_point_cyl(d, c, axis, r, hl, ref):
    """Support POINT of a solid cylinder along unit direction d.  The
    support set degenerates to the side line (d ⊥ axis) or a cap disc
    (d ∥ axis); degenerate coordinates are resolved toward `ref` (the
    AP midpoint — tangentially near the true contact even when AP chose
    the wrong face)."""
    za = _vdot(d, axis)
    perp = d - za * axis
    pn = jnp.linalg.norm(perp)
    relr = ref - c
    zr = _vdot(relr, axis)
    rad_r = relr - zr * axis
    pdir = jnp.where(pn > 1e-6, perp / jnp.maximum(pn, 1e-12),
                     _safe_unit(rad_r, _ortho(axis)))
    zc = jnp.where(jnp.abs(za) > 1e-6, hl * jnp.sign(za),
                   jnp.clip(zr, -hl, hl))
    rc = jnp.where(jnp.abs(za) > 0.999999,
                   jnp.minimum(jnp.linalg.norm(rad_r), r), r)
    return c + axis * zc + pdir * rc


def _supp_point_box(d, c, m, size, ref):
    dl = _mv(m.T, d)
    rl = _mv(m.T, ref - c)
    coord = jnp.where(jnp.abs(dl) > 1e-6, jnp.sign(dl) * size,
                      jnp.clip(rl, -size, size))
    return c + _mv(m, coord)


def _safe_unit(v, fallback):
    ln = jnp.linalg.norm(v)
    return jnp.where(ln > 1e-10, v / jnp.maximum(ln, 1e-10), fallback)


# ---------------------------------------------------------------------------
# box-box (SAT + reference-face clipping, mjc_BoxBox/dBoxBox family)
# ---------------------------------------------------------------------------

def _box_face_manifold(p_ref, R_ref, s_ref, p_inc, R_inc, s_inc, n_world):
    """Contact manifold of the incident box face against the reference
    face rectangle.  `n_world` points from the reference box toward the
    incident box.  Returns (dist(24,), pos(24,3)) with BIG-dist padding
    (24 = all intersection-polygon candidates, unselected)."""
    dtype = p_ref.dtype

    nl_ref = _mv(R_ref.T, n_world)
    kref = jnp.argmax(jnp.abs(nl_ref))
    oh_kref = _oh(kref, 3, dtype)
    sref = jnp.sign(_vdot(nl_ref, oh_kref) + 1e-30)
    nl_inc = _mv(R_inc.T, n_world)
    kinc = jnp.argmax(jnp.abs(nl_inc))
    sinc = -jnp.sign(_vdot(nl_inc, _oh(kinc, 3, dtype)) + 1e-30)

    e_kinc = _oh(kinc, 3, dtype)
    e_uinc = _oh((kinc + 1) % 3, 3, dtype)
    e_vinc = _oh((kinc + 2) % 3, 3, dtype)
    sz_k = _vdot(s_inc, e_kinc)
    sz_u = _vdot(s_inc, e_uinc)
    sz_v = _vdot(s_inc, e_vinc)
    corners_l = jnp.stack([
        e_kinc * sz_k * sinc + e_uinc * sz_u * su + e_vinc * sz_v * sv
        for su in (-1.0, 1.0) for sv in (1.0, -1.0)
    ])  # winding order: (-,+), (-,-) ... keep convex ring: (-,+),(+,+),(+,-),(-,-)
    corners_l = jnp.stack([
        e_kinc * sz_k * sinc - e_uinc * sz_u + e_vinc * sz_v,
        e_kinc * sz_k * sinc + e_uinc * sz_u + e_vinc * sz_v,
        e_kinc * sz_k * sinc + e_uinc * sz_u - e_vinc * sz_v,
        e_kinc * sz_k * sinc - e_uinc * sz_u - e_vinc * sz_v,
    ])
    corners_w = p_inc[None, :] + _mm(corners_l, R_inc.T)

    r_u = _oh((kref + 1) % 3, 3, dtype)
    r_v = _oh((kref + 2) % 3, 3, dtype)
    r_k = oh_kref
    su_ref = _vdot(s_ref, r_u)
    sv_ref = _vdot(s_ref, r_v)
    sk_ref = _vdot(s_ref, r_k)

    def to_ref(q):
        lq = _mv(R_ref.T, q - p_ref)
        return jnp.stack([_vdot(lq, r_u), _vdot(lq, r_v),
                          _vdot(lq, r_k)])

    poly4 = jax.vmap(to_ref)(corners_w)

    # Rect-vs-quad intersection polygon, branchless (the Sutherland-
    # Hodgman chain with argsort compactions was 43 ms for 20 pairs at
    # 1024 envs — ~2/3 of the whole collide stage; sequential op-chain
    # overhead, not FLOPs).  The intersection polygon's <= 8 vertices are
    # exactly: incident corners inside the rect, incident edge x clip-
    # line crossings, and rect corners inside the incident quad — 24
    # candidates evaluated in parallel, one top_k picks the valid ones.
    q = poly4                            # (4, 3) ring order, z linear
    quv = q[:, :2]
    e1, e2 = q[1] - q[0], q[3] - q[0]
    det_p = e1[0] * e2[1] - e1[1] * e2[0]
    det_s = jnp.where(jnp.abs(det_p) > 1e-12, det_p, 1.0)
    az = (e1[2] * e2[1] - e2[2] * e1[1]) / det_s
    bz = (e2[2] * e1[0] - e1[2] * e2[0]) / det_s
    plane_ok = jnp.abs(det_p) > 1e-12

    def z_of(uv):                        # incident-face plane height
        return jnp.where(plane_ok,
                         q[0, 2] + az * (uv[..., 0] - q[0, 0])
                         + bz * (uv[..., 1] - q[0, 1]),
                         q[0, 2])

    # (No jnp.array literals below: constant arrays close over Pallas
    # kernels as captured consts, which pallas_call rejects — everything
    # is built from traced values, rolls and static slices.)
    bounds = jnp.stack([su_ref, sv_ref])
    # 1) incident corners inside the rect (4)
    c_in = jnp.all(jnp.abs(quv) <= bounds[None, :] + 1e-12, axis=1)
    # 2) edge x clip-line crossings, u-lines and v-lines via static slices
    qi = quv                              # (4, 2)
    qj = jnp.roll(quv, -1, axis=0)
    d_e = qj - qi                         # (4, 2)

    def crossings(cidx, bound_c, bound_o):
        """Edge crossings with the two lines coord[cidx] = +-bound_c."""
        oidx = 1 - cidx
        den = d_e[:, cidx:cidx + 1]                     # (4, 1)
        den_s = jnp.where(jnp.abs(den) > 1e-13, den, 1.0)
        line_b = jnp.stack([bound_c, -bound_c])[None, :]  # (1, 2)
        t = (line_b - qi[:, cidx:cidx + 1]) / den_s       # (4, 2)
        pt = qi[:, None, :] + t[:, :, None] * d_e[:, None, :]  # (4,2,2)
        pt_other = pt[:, :, oidx:oidx + 1][:, :, 0]
        ok = ((jnp.abs(den) > 1e-13) & (t >= 0.0) & (t <= 1.0)
              & (jnp.abs(pt_other) <= bound_o + 1e-12))
        # Return (4,2)-shaped halves: Mosaic cannot reshape (4,2,2)->(8,2).
        return (pt[:, 0:1, :][:, 0, :], pt[:, 1:2, :][:, 0, :],
                ok[:, 0:1][:, 0], ok[:, 1:2][:, 0])

    pt_u1, pt_u2, ok_u1, ok_u2 = crossings(0, su_ref, sv_ref)
    pt_v1, pt_v2, ok_v1, ok_v2 = crossings(1, sv_ref, su_ref)
    # 3) rect corners inside the incident quad (4)
    pu, pv = su_ref, sv_ref
    rc = jnp.stack([jnp.stack([pu, pv]), jnp.stack([pu, -pv]),
                    jnp.stack([-pu, pv]), jnp.stack([-pu, -pv])])
    wind = jnp.sign(det_p + 1e-30)
    rel = rc[None, :, :] - qi[:, None, :]          # (edge, corner, 2)
    rel_u = rel[:, :, 0:1][:, :, 0]
    rel_v = rel[:, :, 1:2][:, :, 0]
    de_u = d_e[:, 0:1]
    de_v = d_e[:, 1:2]
    crz = de_u * rel_v - de_v * rel_u
    r_in = jnp.all(crz * wind >= -1e-12, axis=0) & plane_ok

    # All 24 candidates are emitted as contact slots (invalid ones at
    # +BIG); a top_k compaction here would need >2-D gathers, which
    # Pallas/Mosaic cannot lower, and extra masked slots are nearly free
    # downstream.
    uv24 = jnp.concatenate([quv, pt_u1, pt_u2, pt_v1, pt_v2, rc], axis=0)
    # Concatenate validity as floats: Mosaic cannot concat i1 vregs.
    val24 = jnp.concatenate(
        [c_in.astype(dtype), ok_u1.astype(dtype), ok_u2.astype(dtype),
         ok_v1.astype(dtype), ok_v2.astype(dtype), r_in.astype(dtype)],
        axis=0) > 0.5
    z24 = z_of(uv24)
    pts = jnp.concatenate([uv24, z24[:, None]], axis=1)
    valid = val24
    depth = z24 * sref - sk_ref
    # Coincident candidates (a polygon vertex exactly on a clip line
    # appears in two candidate classes) would double a contact row.
    same = (jnp.sum((uv24[:, None, :] - uv24[None, :, :]) ** 2, axis=-1)
            < 1e-18)
    iN = jax.lax.broadcasted_iota(jnp.int32, (24, 24), 0)
    jN = jax.lax.broadcasted_iota(jnp.int32, (24, 24), 1)
    dup = jnp.any(same & (jN < iN) & valid[None, :], axis=1)
    valid = valid & ~dup

    def to_world(q):
        lq = r_u * q[0] + r_v * q[1] + r_k * q[2]
        return p_ref + _mv(R_ref, lq)

    pts_w = jax.vmap(to_world)(pts)
    pos = pts_w - 0.5 * depth[:, None] * n_world[None, :]
    dist = jnp.where(valid, depth, BIG)
    return dist, pos


def box_box(p1, m1, s1, p2, m2, s2, margin=0.0):
    """Box-box via separating axes (6 faces + 9 edge pairs); face contacts
    produce a rect-quad intersection manifold (24 candidate slots, at
    most 8 valid), edge contacts one point."""
    dtype = p1.dtype
    R1, R2 = m1, m2
    C = _mm(R1.T, R2)                  # box2 axes in box1 frame
    pl = _mv(R1.T, p2 - p1)
    eye = _eye3(dtype)

    # Running-max SAT over the 15 axes (no (15,3) stack: wide
    # concatenates fail to lower in Mosaic, and argmax+select is more
    # work than a fused running reduction anyway).  Ties keep the first
    # axis, matching argmax semantics.
    best_sep = jnp.asarray(-BIG, dtype)
    best_nl = _basis(2, dtype)
    best_i = jnp.asarray(0, jnp.int32)

    def consider(idx, sep, nl, st):
        b_sep, b_nl, b_i = st
        better = sep > b_sep
        return (jnp.where(better, sep, b_sep),
                jnp.where(better, nl, b_nl),
                jnp.where(better, jnp.asarray(idx, jnp.int32), b_i))

    st = (best_sep, best_nl, best_i)
    for k in range(3):                 # box1 faces
        rb = _vdot(jnp.abs(C[k, :]), s2)
        sep = jnp.abs(pl[k]) - s1[k] - rb
        st = consider(k, sep, eye[k] * jnp.sign(pl[k] + 1e-30), st)
    for k in range(3):                 # box2 faces
        axis_l = C[:, k]
        proj = _vdot(pl, axis_l)
        ra = _vdot(jnp.abs(axis_l), s1)
        sep = jnp.abs(proj) - ra - s2[k]
        st = consider(3 + k, sep, axis_l * jnp.sign(proj + 1e-30), st)
    for i in range(3):                 # edge-edge
        for jj in range(3):
            axis = _cross(eye[i], C[:, jj])
            nlen = jnp.linalg.norm(axis)
            axis_n = axis / jnp.maximum(nlen, 1e-12)
            proj = _vdot(pl, axis_n)
            ra = _vdot(jnp.abs(axis_n), s1)
            rb = _vdot(jnp.abs(_mv(C.T, axis_n)), s2)
            sep = jnp.abs(proj) - ra - rb
            # ODE-style fudge: prefer face axes; kill degenerate axes.
            sep = jnp.where(nlen > 1e-9, sep - 1e-9, -BIG)
            st = consider(6 + 3 * i + jj, sep,
                          axis_n * jnp.sign(proj + 1e-30), st)

    sep_best, nl_best, best = st
    n_w = _mv(R1, nl_best)             # from box1 toward box2

    use_f1 = best < 3
    use_f2 = (best >= 3) & (best < 6)

    d_f1, p_f1 = _box_face_manifold(p1, R1, s1, p2, R2, s2, n_w)
    d_f2, p_f2 = _box_face_manifold(p2, R2, s2, p1, R1, s1, -n_w)

    # Edge-edge: closest points between the two candidate edges.
    # Support corners along +-n give the touching edge endpoints; use
    # segment-segment closest points between the edges through those
    # corners along directions eye[i] (box1) and C[:, jj] (box2).
    ei = best - 6
    i_idx = jnp.clip(ei // 3, 0, 2)
    j_idx = jnp.clip(ei % 3, 0, 2)
    oh_i = _oh(i_idx, 3, dtype)
    oh_j = _oh(j_idx, 3, dtype)
    dir1_l = oh_i
    dir2_l = _mv(C, oh_j)                       # column j of C
    s1_i = _vdot(s1, oh_i)
    s2_j = _vdot(s2, oh_j)
    corner1_l = jnp.sign(_mv(R1.T, n_w) + 1e-30) * s1
    corner1_l = corner1_l * (1.0 - oh_i)        # zero the edge axis
    corner2_l = jnp.sign(_mv(R2.T, -n_w) + 1e-30) * s2
    corner2_l = corner2_l * (1.0 - oh_j)
    a1 = p1 + _mv(R1, corner1_l - dir1_l * s1_i)
    b1 = p1 + _mv(R1, corner1_l + dir1_l * s1_i)
    a2 = p2 + _mv(R2, corner2_l) - _mv(R1, dir2_l * s2_j)
    b2 = p2 + _mv(R2, corner2_l) + _mv(R1, dir2_l * s2_j)
    c1e, c2e, _ = _segment_closest(a1, b1, a2, b2)
    pos_e = 0.5 * (c1e + c2e)
    first = (_iota1(24) == 0)
    d_e = jnp.where(first, sep_best, BIG)
    p_e = jnp.broadcast_to(pos_e, (24, 3))

    dist = jnp.where(use_f1, d_f1, jnp.where(use_f2, d_f2, d_e))
    pos = jnp.where(use_f1, p_f1, jnp.where(use_f2, p_f2, p_e))
    nrm = jnp.broadcast_to(n_w, (24, 3))
    return dist, pos, nrm
