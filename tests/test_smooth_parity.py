"""Differential tests of smooth dynamics vs the mujoco oracle at random
states: FK, mass matrix, bias forces, passive forces, tendons, actuation,
and the smooth (unconstrained) acceleration."""
import numpy as np
import pytest

from conftest import requires_mujoco, requires_reference

pytestmark = [requires_mujoco, requires_reference]

TASKS = ["hammer", "door", "pen", "relocate"]


@pytest.fixture(scope="module", params=TASKS)
def setup(request):
    import mujoco
    from mj_envs_tpu.mjcf import oracle, builder
    om = oracle.load_oracle(request.param)
    od = mujoco.MjData(om)
    m = builder.build_from_xml(oracle.task_xml_path(request.param))
    return m, om, od, request.param


def random_state(om, rng, scale_q=0.4, scale_v=1.0):
    qpos = np.where(
        om.jnt_limited.astype(bool),
        om.jnt_range[:, 0] + rng.uniform(0.05, 0.95, om.njnt)
        * (om.jnt_range[:, 1] - om.jnt_range[:, 0]),
        rng.uniform(-scale_q, scale_q, om.njnt),
    )
    qvel = rng.uniform(-scale_v, scale_v, om.nv)
    return qpos, qvel


def test_fk_random_states(setup):
    import mujoco
    from mj_envs_tpu.physics import kinematics as K
    m, om, od, _ = setup
    rng = np.random.default_rng(0)
    for _ in range(5):
        qpos, qvel = random_state(om, rng)
        od.qpos[:] = qpos
        od.qvel[:] = qvel
        mujoco.mj_forward(om, od)
        kin = K.kinematics(m, np.asarray(qpos))
        np.testing.assert_allclose(kin.xpos, od.xpos, atol=1e-12)
        np.testing.assert_allclose(kin.xipos, od.xipos, atol=1e-12)
        np.testing.assert_allclose(kin.geom_xpos, od.geom_xpos, atol=1e-12)
        np.testing.assert_allclose(kin.geom_xmat,
                                   od.geom_xmat.reshape(-1, 3, 3),
                                   atol=1e-12)
        np.testing.assert_allclose(kin.site_xpos, od.site_xpos, atol=1e-12)
        np.testing.assert_allclose(kin.subtree_com, od.subtree_com,
                                   atol=1e-12)
        np.testing.assert_allclose(kin.cdof, od.cdof, atol=1e-12)


def test_mass_matrix_and_bias(setup):
    import mujoco
    from mj_envs_tpu.physics import kinematics as K, dynamics as D
    m, om, od, _ = setup
    rng = np.random.default_rng(1)
    for _ in range(5):
        qpos, qvel = random_state(om, rng)
        od.qpos[:] = qpos
        od.qvel[:] = qvel
        mujoco.mj_forward(om, od)
        qM = np.zeros((om.nv, om.nv))
        mujoco.mj_fullM(om, od, qM)
        kin = K.kinematics(m, np.asarray(qpos))
        M = D.crb(m, kin)
        np.testing.assert_allclose(M, qM, atol=1e-11)
        vel = D.com_velocity(m, kin, np.asarray(qvel))
        np.testing.assert_allclose(vel.cvel, od.cvel, atol=1e-11)
        bias = D.bias_force(m, kin, vel, np.asarray(qvel))
        np.testing.assert_allclose(bias, od.qfrc_bias, atol=1e-10)
        passive = D.passive_force(m, np.asarray(qpos), np.asarray(qvel))
        np.testing.assert_allclose(passive, od.qfrc_passive, atol=1e-12)


def test_tendon_and_actuation(setup):
    import mujoco
    from mj_envs_tpu.physics import actuation as A
    m, om, od, _ = setup
    rng = np.random.default_rng(2)
    for _ in range(5):
        qpos, qvel = random_state(om, rng)
        ctrl = rng.uniform(-1.5, 1.5, om.nu)  # beyond range to test clamp
        od.qpos[:] = qpos
        od.qvel[:] = qvel
        od.ctrl[:] = ctrl
        mujoco.mj_forward(om, od)
        act = A.actuation(m, np.asarray(qpos), np.asarray(qvel),
                          np.asarray(ctrl))
        np.testing.assert_allclose(act.ten_length, od.ten_length,
                                   atol=1e-12)
        np.testing.assert_allclose(act.actuator_length, od.actuator_length,
                                   atol=1e-12)
        np.testing.assert_allclose(act.actuator_force, od.actuator_force,
                                   atol=1e-12)
        np.testing.assert_allclose(act.qfrc_actuator, od.qfrc_actuator,
                                   atol=1e-12)


def test_smooth_acceleration(setup):
    """qacc_smooth = M^-1 (actuator + passive + applied - bias)."""
    import mujoco
    from mj_envs_tpu.physics import (kinematics as K, dynamics as D,
                                     actuation as A)
    m, om, od, _ = setup
    rng = np.random.default_rng(3)
    for _ in range(3):
        qpos, qvel = random_state(om, rng)
        ctrl = rng.uniform(-1.0, 1.0, om.nu)
        od.qpos[:] = qpos
        od.qvel[:] = qvel
        od.ctrl[:] = ctrl
        mujoco.mj_forward(om, od)
        kin = K.kinematics(m, np.asarray(qpos))
        M = np.asarray(D.crb(m, kin))
        vel = D.com_velocity(m, kin, np.asarray(qvel))
        bias = np.asarray(D.bias_force(m, kin, vel, np.asarray(qvel)))
        passive = np.asarray(D.passive_force(m, np.asarray(qpos),
                                             np.asarray(qvel)))
        act = A.actuation(m, np.asarray(qpos), np.asarray(qvel),
                          np.asarray(ctrl))
        qacc_smooth = np.linalg.solve(
            M, np.asarray(act.qfrc_actuator) + passive - bias)
        np.testing.assert_allclose(qacc_smooth, od.qacc_smooth,
                                   atol=1e-8)
