"""Measure the observed parity error floor for every task (VERDICT r4
items 4/8): runs the exact loops of tests/test_step_parity.py and prints
the worst qpos/qvel drifts, so the test bounds can be pinned at ~2-4x
the demonstrated floor instead of orders-of-magnitude above it.

    python tools/parity_floor.py
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

TASKS = ["hammer", "door", "pen", "relocate"]


def setup(task):
    xml = O.sanitize(O.task_xml_path(task))
    mm = mujoco.MjModel.from_xml_string(xml)
    md = mujoco.MjData(mm)
    mujoco.mj_forward(mm, md)
    m = B.build_from_xml(O.task_xml_path(task))
    d = M.make_data(m)
    return mm, md, m, d, jax.jit(pipeline.step)


def main():
    for task in TASKS:
        # --- 50-step trajectory drift (seed 0) --------------------------
        mm, md, m, d, step = setup(task)
        rng = np.random.default_rng(0)
        worst_q = worst_v = 0.0
        for t in range(50):
            ctrl = rng.uniform(-1.0, 1.0, mm.nu)
            md.ctrl[:] = ctrl
            mujoco.mj_step(mm, md)
            d = step(m, d, jnp.asarray(ctrl))
            worst_q = max(worst_q, float(np.max(np.abs(
                np.asarray(d.qpos) - md.qpos))))
            worst_v = max(worst_v, float(np.max(np.abs(
                np.asarray(d.qvel) - md.qvel))))
        # --- resynced single-step (seed 1) ------------------------------
        mm, md, m, d, step = setup(task)
        rng = np.random.default_rng(1)
        worst_rv = 0.0
        for t in range(40):
            ctrl = rng.uniform(-1.0, 1.0, mm.nu)
            d = d.replace(
                qpos=jnp.asarray(md.qpos.copy()),
                qvel=jnp.asarray(md.qvel.copy()),
                qacc_warmstart=jnp.asarray(md.qacc_warmstart.copy()))
            md.ctrl[:] = ctrl
            mujoco.mj_step(mm, md)
            d = step(m, d, jnp.asarray(ctrl))
            worst_rv = max(worst_rv, float(np.max(np.abs(
                np.asarray(d.qvel) - md.qvel))))
        print(f"{task:9s} traj_qpos {worst_q:.3e}  traj_qvel {worst_v:.3e}"
              f"  resync_qvel {worst_rv:.3e}", flush=True)


if __name__ == "__main__":
    main()
