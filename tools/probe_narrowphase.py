"""Probe mujoco's narrowphase per geom-type pair: random configurations of
two geoms, dump contact count / dist / pos / frame.  Development aid for the
JAX narrowphase; the same scenes back tests/test_collision_parity.py."""
import numpy as np
import mujoco

TYPES = {
    "plane": ("plane", "4 4 0.1"),
    "sphere": ("sphere", None),
    "capsule": ("capsule", None),
    "cylinder": ("cylinder", None),
    "box": ("box", None),
}


def make_scene(t1, size1, pos1, quat1, t2, size2, pos2, quat2,
               margin=0.0, condim=3):
    def geom(name, t, size, pos, quat):
        sz = " ".join(str(x) for x in size)
        p = " ".join(str(x) for x in pos)
        q = " ".join(str(x) for x in quat)
        return (f'<geom name="{name}" type="{t}" size="{sz}" pos="{p}" '
                f'quat="{q}" contype="0" conaffinity="0"/>')

    xml = f"""
<mujoco>
  <worldbody>
    <body name="b1">{geom('g1', t1, size1, pos1, quat1)}</body>
    <body name="b2">{geom('g2', t2, size2, pos2, quat2)}</body>
  </worldbody>
  <contact>
    <pair geom1="g1" geom2="g2" margin="{margin}" condim="{condim}"/>
  </contact>
</mujoco>
"""
    m = mujoco.MjModel.from_xml_string(xml)
    d = mujoco.MjData(m)
    mujoco.mj_forward(m, d)
    return m, d


def rand_quat(rng):
    q = rng.normal(size=4)
    return q / np.linalg.norm(q)


def probe(t1, t2, n=10, seed=0, margin=0.0):
    rng = np.random.default_rng(seed)
    out = []
    for _ in range(n):
        s1 = rng.uniform(0.05, 0.4, 3)
        s2 = rng.uniform(0.05, 0.4, 3)
        if t1 == "plane":
            s1 = np.array([2.0, 2.0, 0.1])
            p1, q1 = np.zeros(3), np.array([1.0, 0, 0, 0])
            p2 = np.array([rng.uniform(-0.2, 0.2), rng.uniform(-0.2, 0.2),
                           rng.uniform(0.0, 0.5)])
            q2 = rand_quat(rng)
        else:
            p1, q1 = np.zeros(3), rand_quat(rng)
            p2 = rng.uniform(-0.3, 0.3, 3)
            q2 = rand_quat(rng)
        m, d = make_scene(t1, s1, p1, q1, t2, s2, p2, q2, margin=margin)
        cons = []
        for i in range(d.ncon):
            c = d.contact[i]
            cons.append(dict(dist=c.dist, pos=c.pos.copy(),
                             frame=c.frame.copy().reshape(3, 3)))
        out.append(dict(s1=s1, p1=p1, q1=q1, s2=s2, p2=p2, q2=q2,
                        contacts=cons))
    return out


if __name__ == "__main__":
    import sys
    t1, t2 = sys.argv[1], sys.argv[2]
    n = int(sys.argv[3]) if len(sys.argv) > 3 else 6
    res = probe(t1, t2, n=n)
    for r in res:
        print(f"--- s1={np.round(r['s1'],3)} s2={np.round(r['s2'],3)} "
              f"p2={np.round(r['p2'],3)} ncon={len(r['contacts'])}")
        for c in r["contacts"]:
            print(f"    dist={c['dist']:+.5f} pos={np.round(c['pos'],4)} "
                  f"n={np.round(c['frame'][0],4)}")
