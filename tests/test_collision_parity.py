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


# ---------------------------------------------------------------------------
# Deep-contact regression: hammer-head rim pressed laterally into the thin
# nail-cap disc (real poses captured from a DAPG expert's nail strike,
# hammer-v0 t=35).  The support-gap objective has an axial local maximum
# ~5x deeper than the true lateral escape here; single-start ascent took it
# and under-drove the nail, stalling the expert just above the success
# threshold (reference success semantics `hammer_v0.py:167-175`).  Guards
# the multi-start candidate directions in `_convex_contact`.
# ---------------------------------------------------------------------------

_NAIL_STRIKE_CASES = [
    # (p_cap, R_cap(9), p_head, R_head(9), oracle dist, oracle pos, oracle n)
    (np.array([-0.04209871582241023, -0.03580610834070156, 0.17502861817588966]),
     np.array([3.6235793645673475e-01, 1.3114075628206656e-06, -9.3203901521615373e-01,
               -9.3203872040625213e-01, 7.9588062467730869e-04, -3.6235782072077349e-01,
               7.4131659486731394e-04, 9.9999968328610589e-01, 2.8961594345075503e-04]),
     np.array([-0.07874243378847695, -0.06115002387020238, 0.14660332162990003]),
     np.array([0.8264258347704715, -0.2921574036223554, -0.48131527207494074,
               -0.5515350732228002, -0.2480883660619732, -0.7964051893539,
               0.11326695294325964, 0.9236320772544363, -0.36616169001904736]),
     -0.004670639461066734,
     np.array([-0.04458050452219002, -0.03679369522867415, 0.1532633656752001]),
     np.array([-9.3203899718973959e-01, -3.6235786710588802e-01, 2.8959284603229877e-04])),
    (np.array([-0.04007575828231273, -0.0350196235759298, 0.17502798957478288]),
     np.array([3.6235793645673475e-01, 1.3114075628206656e-06, -9.3203901521615373e-01,
               -9.3203872040625213e-01, 7.9588062467730869e-04, -3.6235782072077349e-01,
               7.4131659486731394e-04, 9.9999968328610589e-01, 2.8961594345075503e-04]),
     np.array([-0.07348746662123523, -0.05911551310610447, 0.14880247939119062]),
     np.array([0.8197523496622506, -0.29433521799315915, -0.49129712463247555,
               -0.5620505947492835, -0.2486489158102897, -0.7888427255215983,
               0.11002369819813965, 0.9227895188586, -0.3692618173051714]),
     -0.008252413182072545,
     np.array([-0.04071929619512904, -0.03579144155806618, 0.15539449546411926]),
     np.array([-9.3203916180416813e-01, -3.6235744577835116e-01, 2.8697103179682333e-04])),
    (np.array([-0.03394714340037628, -0.0326369427048502, 0.17502608520752777]),
     np.array([3.6235793645673475e-01, 1.3114075628206656e-06, -9.3203901521615373e-01,
               -9.3203872040625213e-01, 7.9588062467730869e-04, -3.6235782072077349e-01,
               7.4131659486731394e-04, 9.9999968328610589e-01, 2.8961594345075503e-04]),
     np.array([-0.06350261682801564, -0.05572591856367987, 0.15257185345931543]),
     np.array([0.8072442934474063, -0.29834323684502473, -0.5092621758244282,
               -0.5808402954318195, -0.24836893749938588, -0.7752015364330122,
               0.10479123006852245, 0.9215770092153229, -0.3737841812951243]),
     -0.012415156570488979,
     np.array([-0.03221593602317201, -0.03377018847965715, 0.1588818763056773]),
     np.array([-9.3203834544735786e-01, -3.6235954219935074e-01, 2.9119208188323675e-04])),
]


@pytest.mark.parametrize("case", range(len(_NAIL_STRIKE_CASES)))
def test_cylinder_cylinder_deep_rim_strike(case):
    import mj_envs_tpu.physics.collision.narrowphase as N
    p1, m1, p2, m2, dist_o, pos_o, n_o = _NAIL_STRIKE_CASES[case]
    s1 = np.array([0.035, 0.005, 0.0])   # nail cap disc
    s2 = np.array([0.02, 0.04, 0.0])     # hammer head
    d, pos, nrm = N.cylinder_cylinder(p1, m1.reshape(3, 3), s1,
                                      p2, m2.reshape(3, 3), s2)
    d, pos, nrm = np.asarray(d), np.asarray(pos), np.asarray(nrm)
    i = int(np.argmin(d))
    assert abs(d[i] - dist_o) < 5e-5, (d[i], dist_o)
    assert np.dot(nrm[i], n_o) > 0.999, (nrm[i], n_o)
    assert np.linalg.norm(pos[i] - pos_o) < 2e-3, (pos[i], pos_o)
