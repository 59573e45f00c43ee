"""Task-layer parity: obs / reward / termination formulas vs the oracle.

Strategy: drive the mujoco oracle (with the reference's constructor-time
actuator overrides applied) through the reference step semantics
(clip -> act_mid + a*act_rng -> frame_skip x mj_step); at each step,
sync our env's physics state to the oracle and compare our fused
obs/reward kernels against NumPy re-implementations of the reference
formulas (`hammer_v0.py:54-104`, `door_v0.py:56-101`, `pen_v0.py:66-113`,
`relocate_v0.py:47-83`) evaluated on oracle MjData fields.  This isolates
the task layer from physics error (physics parity is tested in
test_step_parity.py).
"""
import numpy as np
import pytest

from conftest import requires_mujoco, requires_reference

pytestmark = [requires_mujoco, requires_reference]


def _quat2euler_np(quat):
    """Reference quatmath quat2euler = mat2euler(quat2mat(q))
    (`utils/quatmath.py:136-164`)."""
    q = np.asarray(quat, dtype=np.float64)
    Nq = np.sum(q * q)
    if Nq < np.finfo(np.float64).eps:
        mat = np.eye(3)
    else:
        w, x, y, z = q
        s = 2.0 / Nq
        X, Y, Z = x * s, y * s, z * s
        wX, wY, wZ = w * X, w * Y, w * Z
        xX, xY, xZ = x * X, x * Y, x * Z
        yY, yZ, zZ = y * Y, y * Z, z * Z
        mat = np.array([
            [1.0 - (yY + zZ), xY - wZ, xZ + wY],
            [xY + wZ, 1.0 - (xX + zZ), yZ - wX],
            [xZ - wY, yZ + wX, 1.0 - (xX + yY)]])
    # mat2euler (:79-96)
    cy = np.sqrt(mat[2, 2] * mat[2, 2] + mat[1, 2] * mat[1, 2])
    if cy > np.finfo(np.float64).eps * 4.0:
        return np.array([
            -np.arctan2(mat[1, 2], mat[2, 2]),
            -np.arctan2(-mat[0, 2], cy),
            -np.arctan2(mat[0, 1], mat[0, 0])])
    return np.array([
        -np.arctan2(-mat[2, 1], mat[1, 1]),
        -np.arctan2(-mat[0, 2], cy), 0.0])


import functools


@functools.lru_cache(maxsize=None)
def _env_cached(task):
    """One env (and thus one set of jitted programs) per task per process
    — repeated jit-of-identical-program deserializations segfault
    jaxlib's CPU AOT loader in long suite runs (see test_step_parity)."""
    from mj_envs_tpu import envs
    return envs.make(f"{task}-v0", dtype=__import__("jax.numpy",
                                                    fromlist=["x"]).float64)


def _setup(task):
    import mujoco
    from mj_envs_tpu.mjcf import oracle as O

    env = _env_cached(task)
    mm = mujoco.MjModel.from_xml_string(O.sanitize(O.task_xml_path(task)))
    md = mujoco.MjData(mm)

    # Apply the reference's actuator overrides to the oracle
    # (hammer_v0.py:29-32).
    def aid(n):
        return mujoco.mj_name2id(mm, mujoco.mjtObj.mjOBJ_ACTUATOR, n)
    w0, w1 = aid("A_WRJ1"), aid("A_WRJ0")
    f0, f1 = aid("A_FFJ3"), aid("A_THJ0")
    mm.actuator_gainprm[w0:w1 + 1, :3] = [10, 0, 0]
    mm.actuator_biasprm[w0:w1 + 1, :3] = [0, -10, 0]
    mm.actuator_gainprm[f0:f1 + 1, :3] = [1, 0, 0]
    mm.actuator_biasprm[f0:f1 + 1, :3] = [0, -1, 0]

    act_mid = mm.actuator_ctrlrange.mean(axis=1)
    act_rng = 0.5 * (mm.actuator_ctrlrange[:, 1]
                     - mm.actuator_ctrlrange[:, 0])
    mujoco.mj_forward(mm, md)
    return env, mm, md, act_mid, act_rng, mujoco


def _sid(mm, mujoco, name):
    return mujoco.mj_name2id(mm, mujoco.mjtObj.mjOBJ_SITE, name)


def _bid(mm, mujoco, name):
    return mujoco.mj_name2id(mm, mujoco.mjtObj.mjOBJ_BODY, name)


def _oracle_obs_reward(task, mm, md, mujoco):
    """Reference get_obs + reward from oracle fields (NumPy)."""
    qp = md.qpos.ravel().copy()
    qv = md.qvel.ravel().copy()
    sx = md.site_xpos
    if task == "hammer":
        obj = md.xpos[_bid(mm, mujoco, "Object")]
        palm = sx[_sid(mm, mujoco, "S_grasp")]
        tool = sx[_sid(mm, mujoco, "tool")]
        target = sx[_sid(mm, mujoco, "S_target")]
        goal = sx[_sid(mm, mujoco, "nail_goal")]
        nail_sen = mujoco.mj_name2id(mm, mujoco.mjtObj.mjOBJ_SENSOR,
                                     "S_nail")
        nail = np.clip(md.sensordata[mm.sensor_adr[nail_sen]], -1, 1)
        obs = np.concatenate([
            qp[:-6], np.clip(qv, -1, 1)[-6:], palm, obj,
            _quat2euler_np(md.xquat[_bid(mm, mujoco, "Object")]),
            target, [nail]])
        tg = np.linalg.norm(target - goal)
        r = (-0.1 * np.linalg.norm(palm - obj)
             - np.linalg.norm(tool - target) - 10 * tg
             - 1e-2 * np.linalg.norm(qv))
        if obj[2] > 0.04 and tool[2] > 0.04:
            r += 2
        if tg < 0.02:
            r += 25
        if tg < 0.01:
            r += 75
        return obs, r, False
    if task == "door":
        hid = mujoco.mj_name2id(mm, mujoco.mjtObj.mjOBJ_JOINT, "door_hinge")
        dp = qp[mm.jnt_qposadr[hid]]
        palm = sx[_sid(mm, mujoco, "S_grasp")]
        handle = sx[_sid(mm, mujoco, "S_handle")]
        obs = np.concatenate([
            qp[1:-2], [qp[-1]], [dp], palm, handle, palm - handle,
            [1.0 if dp > 1.0 else -1.0]])
        r = (-0.1 * np.linalg.norm(palm - handle)
             - 0.1 * (dp - 1.57) ** 2 - 1e-5 * np.sum(qv ** 2))
        if dp > 0.2:
            r += 2
        if dp > 1.0:
            r += 8
        if dp > 1.35:
            r += 10
        return obs, r, False
    if task == "pen":
        obj = md.xpos[_bid(mm, mujoco, "Object")]
        des = sx[_sid(mm, mujoco, "eps_ball")]
        ot = sx[_sid(mm, mujoco, "object_top")]
        ob = sx[_sid(mm, mujoco, "object_bottom")]
        tt = sx[_sid(mm, mujoco, "target_top")]
        tb = sx[_sid(mm, mujoco, "target_bottom")]
        pen_len = np.linalg.norm(
            mm.site_pos[_sid(mm, mujoco, "object_top")]
            - mm.site_pos[_sid(mm, mujoco, "object_bottom")])
        tar_len = np.linalg.norm(
            mm.site_pos[_sid(mm, mujoco, "target_top")]
            - mm.site_pos[_sid(mm, mujoco, "target_bottom")])
        oo = (ot - ob) / pen_len
        do = (tt - tb) / tar_len
        obs = np.concatenate([qp[:-6], obj, qv[-6:], oo, do,
                              obj - des, oo - do])
        dist = np.linalg.norm(obj - des)
        sim = np.dot(oo, do)
        r = -dist + sim
        if dist < 0.075 and sim > 0.9:
            r += 10
        if dist < 0.075 and sim > 0.95:
            r += 50
        done = False
        if obj[2] < 0.075:
            r -= 5
            done = True
        return obs, r, done
    # relocate
    obj = md.xpos[_bid(mm, mujoco, "Object")]
    palm = sx[_sid(mm, mujoco, "S_grasp")]
    target = sx[_sid(mm, mujoco, "target")]
    obs = np.concatenate([qp[:-6], palm - obj, palm - target,
                          obj - target])
    ot = np.linalg.norm(obj - target)
    r = -0.1 * np.linalg.norm(palm - obj)
    if obj[2] > 0.04:
        r += 1.0 - 0.5 * np.linalg.norm(palm - target) - 0.5 * ot
    if ot < 0.1:
        r += 10
    if ot < 0.05:
        r += 20
    return obs, r, False


@pytest.mark.parametrize("task", ["hammer", "door", "pen", "relocate"])
def test_obs_reward_parity(task):
    import jax.numpy as jnp
    env, mm, md, act_mid, act_rng, mujoco = _setup(task)
    rng = np.random.default_rng(7)

    state = env.reset(__import__("jax").random.PRNGKey(0))
    # Align the randomized model fields with the (default) oracle model,
    # and compare on FRESH kinematics both sides: set_physics_state runs a
    # fresh forward pass, so the oracle needs mj_forward too (after
    # mj_step its caches are pre-integration — that stale-cache semantics
    # is exercised by the trajectory tests, not here).
    state = state.replace(var=env.base_var())
    worst_obs = worst_r = 0.0
    for t in range(12):
        a = rng.uniform(-1, 1, mm.nu)
        ctrl = act_mid + np.clip(a, -1, 1) * act_rng
        md.ctrl[:] = ctrl
        for _ in range(env.FRAME_SKIP):
            mujoco.mj_step(mm, md)
        mujoco.mj_forward(mm, md)
        obs_ref, r_ref, done_ref = _oracle_obs_reward(task, mm, md, mujoco)

        # Sync physics state into our env and evaluate the fused kernels.
        state = env.set_physics_state(state, md.qpos.copy(), md.qvel.copy())
        from mj_envs_tpu.envs.base import _apply_var
        model = _apply_var(env.model, state.var)
        obs_j = np.asarray(env._obs(model, state.data))
        r_j, done_j, _ = env._reward_done(model, state.data)

        worst_obs = max(worst_obs, float(np.max(np.abs(obs_j - obs_ref))))
        worst_r = max(worst_r, abs(float(r_j) - r_ref))
        assert bool(done_j) == done_ref
    assert worst_obs < 1e-8, f"{task}: obs err {worst_obs}"
    assert worst_r < 1e-8, f"{task}: reward err {worst_r}"


@pytest.mark.parametrize("task,expected", [
    ("hammer", 46), ("door", 39), ("pen", 45), ("relocate", 39)])
def test_obs_dims(task, expected):
    """Dimension table from SURVEY.md §2.7a-d."""
    import jax
    from mj_envs_tpu import envs
    env = envs.make(f"{task}-v0")
    state = env.reset(jax.random.PRNGKey(0))
    assert state.obs.shape == (expected,)
    assert env.OBS_DIM == expected


@pytest.mark.parametrize("task", ["hammer", "door", "pen", "relocate"])
def test_reset_randomization_bounds(task):
    """Reset distributions match the reference's uniform ranges
    (`hammer_v0.py:106-109`, `door_v0.py:103-110`, `pen_v0.py:115-123`,
    `relocate_v0.py:85-94`)."""
    import jax
    from mj_envs_tpu import envs
    env = envs.make(f"{task}-v0")
    keys = jax.random.split(jax.random.PRNGKey(1), 32)
    vars_ = jax.vmap(lambda k: env._reset_var(env.base_var(), k))(keys)
    bp = np.asarray(vars_.body_pos)
    if task == "hammer":
        z = bp[:, env.board_bid, 2]
        assert z.min() >= 0.1 and z.max() <= 0.25 and z.std() > 0.01
    elif task == "door":
        f = bp[:, env.door_bid]
        assert f[:, 0].min() >= -0.3 and f[:, 0].max() <= -0.2
        assert f[:, 1].min() >= 0.25 and f[:, 1].max() <= 0.35
        assert f[:, 2].min() >= 0.252 and f[:, 2].max() <= 0.35
    elif task == "pen":
        q = np.asarray(vars_.body_quat)[:, env.target_obj_bid]
        assert np.allclose(np.linalg.norm(q, axis=-1), 1.0, atol=1e-5)
        assert q.std(axis=0).max() > 0.05
    else:
        o = bp[:, env.obj_bid]
        assert o[:, 0].min() >= -0.15 and o[:, 0].max() <= 0.15
        assert o[:, 1].min() >= -0.15 and o[:, 1].max() <= 0.3
        t = np.asarray(vars_.site_pos)[:, env.target_obj_sid]
        assert t[:, 2].min() >= 0.15 and t[:, 2].max() <= 0.35
