"""Pen-v0 parity isolation experiment (VERDICT round-1 item 3).

Question: is the loose pen parity (3e-2 qpos / 1.5 qvel over 50 steps)
our model error, or mujoco-3.10 oracle noise from the native-CCD
narrowphase (multi-point convex manifolds with duplicate contact
clusters — behavior the real mujoco-py 2.1 reference did NOT have)?

Experiment: run the same fixed-seed 50-step random-action rollout
against THREE oracles:
  a) mujoco 3.10 default (native CCD)          — current test oracle
  b) mujoco 3.10 with <flag nativeccd="disable"/> — legacy libccd/MPR
     path, one contact point per convex pair, as in MuJoCo 2.1
  c) oracle (a) vs oracle (b) directly          — pure engine-version noise

If drift(ours vs b) << drift(ours vs a) ~= drift(a vs b), the gap is
oracle narrowphase noise, not model error.

    python tools/pen_parity_probe.py [task=pen] [steps=50]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mj_envs_tpu.utils.hostcpu import pin_cpu
pin_cpu()

import numpy as np
import jax

jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import mujoco

from mj_envs_tpu.mjcf import oracle as O, builder as B
from mj_envs_tpu.physics import pipeline, model as M


def disable_nativeccd(xml: str) -> str:
    """Insert <flag nativeccd="disable"/> into the option element."""
    assert "<option" in xml
    if "<flag" in xml:
        return xml.replace("<flag", '<flag nativeccd="disable" ', 1)
    # option may be self-closing or paired
    i = xml.index("<option")
    j = xml.index(">", i)
    if xml[j - 1] == "/":
        open_tag = xml[i:j - 1] + ">"
        return (xml[:i] + open_tag + '<flag nativeccd="disable"/>'
                + "</option>" + xml[j + 1:])
    return xml[:j + 1] + '<flag nativeccd="disable"/>' + xml[j + 1:]


def rollout_oracle(xml: str, ctrls):
    mm = mujoco.MjModel.from_xml_string(xml)
    md = mujoco.MjData(mm)
    mujoco.mj_forward(mm, md)
    qs, vs, ncons = [], [], []
    for ctrl in ctrls:
        md.ctrl[:] = ctrl
        mujoco.mj_step(mm, md)
        qs.append(md.qpos.copy())
        vs.append(md.qvel.copy())
        ncons.append(md.ncon)
    return np.array(qs), np.array(vs), np.array(ncons)


def rollout_ours(task: str, ctrls):
    m = B.build_from_xml(O.task_xml_path(task))
    d = M.make_data(m)
    step = jax.jit(pipeline.step)
    qs, vs = [], []
    for ctrl in ctrls:
        d = step(m, d, jnp.asarray(ctrl))
        qs.append(np.asarray(d.qpos))
        vs.append(np.asarray(d.qvel))
    return np.array(qs), np.array(vs)


def drift(a, b):
    return np.abs(a - b).max(axis=1)  # per-step max abs


def main():
    task = sys.argv[1] if len(sys.argv) > 1 else "pen"
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 50

    xml = O.sanitize(O.task_xml_path(task))
    xml_noccd = disable_nativeccd(xml)
    mm = mujoco.MjModel.from_xml_string(xml)
    rng = np.random.default_rng(0)
    ctrls = [rng.uniform(-1.0, 1.0, mm.nu) for _ in range(steps)]

    qa, va, nca = rollout_oracle(xml, ctrls)
    qb, vb, ncb = rollout_oracle(xml_noccd, ctrls)
    qo, vo = rollout_ours(task, ctrls)

    print(f"task={task} steps={steps}")
    print(f"oracle(a) ncon range {nca.min()}-{nca.max()}; "
          f"oracle(b) {ncb.min()}-{ncb.max()}")
    for name, (q1, v1), (q2, v2) in [
        ("ours  vs CCD-oracle(a)", (qo, vo), (qa, va)),
        ("ours  vs MPR-oracle(b)", (qo, vo), (qb, vb)),
        ("a     vs b  (engine noise)", (qa, va), (qb, vb)),
    ]:
        dq = drift(q1, q2)
        dv = drift(v1, v2)
        print(f"{name}: qpos max {dq.max():.3e} (final {dq[-1]:.3e}) "
              f"qvel max {dv.max():.3e} (final {dv[-1]:.3e})")


if __name__ == "__main__":
    main()
