"""Narrowphase differential tests vs the mujoco oracle.

Random shallow-contact configurations (the regime physics actually visits at
dt=0.002) per geom-type pair.  Tiers:

* exact  — contact count, dist, pos, normal all match to 1e-8;
* dist   — dist + normal match to tolerance, primary contact pos matches;
           count may differ (mujoco 3.x native-CCD emits duplicate point
           clusters; mujoco 2.1 — the engine the reference ran — emitted a
           single MPR point for these pairs).
"""
import numpy as np
import pytest

from conftest import requires_mujoco

pytestmark = [requires_mujoco]


def _fns():
    import mj_envs_tpu.physics.collision.narrowphase as N
    return {
        ("plane", "sphere"): N.plane_sphere,
        ("plane", "capsule"): N.plane_capsule,
        ("plane", "cylinder"): N.plane_cylinder,
        ("plane", "box"): N.plane_box,
        ("sphere", "sphere"): N.sphere_sphere,
        ("sphere", "capsule"): N.sphere_capsule,
        ("sphere", "cylinder"): N.sphere_cylinder,
        ("sphere", "box"): N.sphere_box,
        ("capsule", "capsule"): N.capsule_capsule,
        ("capsule", "box"): N.capsule_box,
        ("capsule", "cylinder"): N.capsule_cylinder,
        ("cylinder", "cylinder"): N.cylinder_cylinder,
        ("cylinder", "box"): N.cylinder_box,
        ("box", "box"): N.box_box,
    }


def _make_scene(t1, s1, p1, q1, t2, s2, p2, q2, margin=0.0):
    import mujoco
    def geom(name, t, size, pos, quat):
        sz = " ".join(str(x) for x in size)
        p = " ".join(str(x) for x in pos)
        q = " ".join(str(x) for x in quat)
        return (f'<geom name="{name}" type="{t}" size="{sz}" pos="{p}" '
                f'quat="{q}" contype="0" conaffinity="0"/>')
    xml = f"""
<mujoco><worldbody>
  <body name="b1">{geom('g1', t1, s1, p1, q1)}</body>
  <body name="b2">{geom('g2', t2, s2, p2, q2)}</body>
</worldbody>
<contact><pair geom1="g1" geom2="g2" margin="{margin}"/></contact>
</mujoco>"""
    m = mujoco.MjModel.from_xml_string(xml)
    d = mujoco.MjData(m)
    mujoco.mj_forward(m, d)
    return m, d


def _rand_quat(rng):
    q = rng.normal(size=4)
    return q / np.linalg.norm(q)


def _shallow_configs(t1, t2, n, seed, target=-0.002):
    rng = np.random.default_rng(seed)
    out, tries = [], 0
    while len(out) < n and tries < n * 30:
        tries += 1
        s1 = rng.uniform(0.05, 0.4, 3)
        s2 = rng.uniform(0.05, 0.4, 3)
        if t1 == "plane":
            s1 = np.array([2.0, 2.0, 0.1])
            p1, q1 = np.zeros(3), np.array([1.0, 0, 0, 0])
            direction = np.array([0.0, 0, 1.0])
        else:
            p1, q1 = np.zeros(3), _rand_quat(rng)
            direction = rng.normal(size=3)
            direction /= np.linalg.norm(direction)
        q2 = _rand_quat(rng)

        def deepest(t):
            m, d = _make_scene(t1, s1, p1, q1, t2, s2, direction * t, q2,
                               margin=0.05)
            if d.ncon == 0:
                return None
            return min(d.contact[i].dist for i in range(d.ncon))

        lo_t = None
        for tt in np.linspace(0.0, 3.0, 61):
            dm = deepest(tt)
            if dm is not None and dm < target:
                lo_t = tt
        if lo_t is None:
            continue
        hi_t = lo_t + 0.05
        for _ in range(40):
            mid = 0.5 * (lo_t + hi_t)
            dm = deepest(mid)
            if dm is None or dm > target:
                hi_t = mid
            else:
                lo_t = mid
        m, d = _make_scene(t1, s1, p1, q1, t2, s2, direction * lo_t, q2)
        if d.ncon == 0:
            continue
        cons = [dict(dist=d.contact[i].dist, pos=d.contact[i].pos.copy(),
                     n=d.contact[i].frame[:3].copy()) for i in range(d.ncon)]
        out.append(dict(s1=s1, p1=p1, q1=q1, s2=s2, p2=direction * lo_t,
                        q2=q2, contacts=cons))
    return out


EXACT = [("plane", "sphere"), ("plane", "capsule"), ("plane", "cylinder"),
         ("plane", "box"), ("sphere", "sphere"), ("sphere", "capsule"),
         ("sphere", "cylinder"), ("sphere", "box"), ("capsule", "capsule")]
DIST_TIER = [("capsule", "box"), ("capsule", "cylinder"),
             ("cylinder", "cylinder"), ("cylinder", "box"), ("box", "box")]


@pytest.mark.parametrize("t1,t2", EXACT)
def test_exact_pairs(t1, t2):
    from mj_envs_tpu.mjcf.parser import quat_to_mat_np
    fn = _fns()[(t1, t2)]
    data = _shallow_configs(t1, t2, 8, seed=hash((t1, t2)) % 2**31)
    assert data, "no configs generated"
    for r in data:
        m1, m2 = quat_to_mat_np(r["q1"]), quat_to_mat_np(r["q2"])
        d, pos, nrm = fn(r["p1"], m1, r["s1"], r["p2"], m2, r["s2"])
        d, pos, nrm = np.asarray(d), np.asarray(pos), np.asarray(nrm)
        mine = [(d[i], pos[i], nrm[i]) for i in range(len(d)) if d[i] < 0]
        assert len(mine) == len(r["contacts"])
        used = set()
        for c in r["contacts"]:
            errs = [np.linalg.norm(pos_i - c["pos"]) if i not in used
                    else 1e9 for i, (d_i, pos_i, n_i) in enumerate(mine)]
            bi = int(np.argmin(errs))
            used.add(bi)
            d_i, pos_i, n_i = mine[bi]
            assert abs(d_i - c["dist"]) < 1e-8
            assert np.linalg.norm(pos_i - c["pos"]) < 1e-8
            assert np.linalg.norm(n_i - c["n"]) < 1e-8


@pytest.mark.parametrize("t1,t2", DIST_TIER)
def test_dist_tier_pairs(t1, t2):
    """Primary contact: dist within 2mm, normal within 0.2; count may
    differ (duplicate clusters / manifold points)."""
    from mj_envs_tpu.mjcf.parser import quat_to_mat_np
    fn = _fns()[(t1, t2)]
    data = _shallow_configs(t1, t2, 6, seed=hash((t1, t2)) % 2**31)
    assert data, "no configs generated"
    n_ok = 0
    for r in data:
        m1, m2 = quat_to_mat_np(r["q1"]), quat_to_mat_np(r["q2"])
        d, pos, nrm = fn(r["p1"], m1, r["s1"], r["p2"], m2, r["s2"])
        d, pos, nrm = np.asarray(d), np.asarray(pos), np.asarray(nrm)
        mine = [(d[i], pos[i], nrm[i]) for i in range(len(d)) if d[i] < 0]
        if not mine:
            continue
        # Oracle's deepest contact.
        oc = min(r["contacts"], key=lambda c: c["dist"])
        # My closest-matching contact by normal.
        best = max(mine, key=lambda t: float(np.dot(t[2], oc["n"])))
        if (abs(best[0] - oc["dist"]) < 2e-3
                and np.linalg.norm(best[2] - oc["n"]) < 0.2):
            n_ok += 1
    assert n_ok >= max(1, int(0.8 * len(data))), f"{n_ok}/{len(data)}"
