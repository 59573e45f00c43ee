"""Per-stage timing of the physics substep on the current backend.

Attributes the substep wall-clock to pipeline stages by timing nested
prefixes of the pipeline (kinematics -> +CRB/bias -> +actuation ->
+collide -> +rows -> +newton -> +noslip -> full step) at a given env
batch, each as its own jitted+vmapped function.  Stage cost = time of
prefix k minus prefix k-1 (XLA may fuse differently per prefix, so
treat deltas as attribution, not gospel).

    NUM_ENVS=1024 TASK=hammer python tools/profile_substep.py

Also reports the env-step (frame_skip substeps + obs/reward) and the
auto-reset step for context, and optionally dumps a jax.profiler trace
(PROFILE_DIR=/tmp/trace).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from mj_envs_tpu import envs
from mj_envs_tpu.physics import pipeline, kinematics as K, dynamics as D
from mj_envs_tpu.physics import actuation as A, constraint as CN, solver as S
from mj_envs_tpu.physics.collision import driver as C

NUM_ENVS = int(os.environ.get("NUM_ENVS", "1024"))
TASK = os.environ.get("TASK", "hammer")
REPS = int(os.environ.get("REPS", "5"))
# Through the axon tunnel a single dispatch+sync costs ~25 ms of RTT,
# swamping per-stage attribution.  AMORTIZE=K runs each stage K times
# inside one jitted lax.scan (with a value dependency between
# iterations so XLA cannot hoist the work) and reports time/K.
AMORT = int(os.environ.get("AMORTIZE", "0"))


def _amortized(fn, k: int):
    def wrapped(qpos, qvel, ctrl):
        def body(carry, _):
            q, acc = carry
            o = fn(q, qvel, ctrl)
            return (q + 1e-30 * o, acc + o), ()
        (_, acc), _ = jax.lax.scan(
            body, (qpos, jnp.zeros((), qpos.dtype)), (), length=k)
        return acc
    return wrapped


def make_stages(env):
    m = env.model
    s = m.spec
    ncmax = pipeline._ncmax(s)

    def st_kin(qpos, qvel, ctrl):
        kin = K.kinematics(m, qpos)
        return kin.geom_xpos.sum()

    def st_smooth(qpos, qvel, ctrl):
        kin = K.kinematics(m, qpos)
        M = D.crb(m, kin)
        vel = D.com_velocity(m, kin, qvel)
        qfrc_bias = D.bias_force(m, kin, vel, qvel)
        qfrc_passive = D.passive_force(m, qpos, qvel)
        act = A.actuation(m, qpos, qvel, ctrl)
        from mj_envs_tpu.physics.kernels import chol_solve
        qacc = chol_solve(M, act.qfrc_actuator + qfrc_passive - qfrc_bias)
        return qacc.sum()

    def st_collide(qpos, qvel, ctrl):
        kin = K.kinematics(m, qpos)
        _, cc = C.collide(m, kin, ncmax)
        return cc.dist.sum()

    def st_rows(qpos, qvel, ctrl):
        kin = K.kinematics(m, qpos)
        _, cc = C.collide(m, kin, ncmax)
        rows = CN.make_rows(m, kin, qpos, qvel, cc)
        return rows.J.sum() + rows.aref.sum()

    def st_newton(qpos, qvel, ctrl):
        kin = K.kinematics(m, qpos)
        M = D.crb(m, kin)
        vel = D.com_velocity(m, kin, qvel)
        qfrc_bias = D.bias_force(m, kin, vel, qvel)
        qfrc_passive = D.passive_force(m, qpos, qvel)
        act = A.actuation(m, qpos, qvel, ctrl)
        from mj_envs_tpu.physics.kernels import chol_solve
        qacc_smooth = chol_solve(
            M, act.qfrc_actuator + qfrc_passive - qfrc_bias)
        _, cc = C.collide(m, kin, ncmax)
        rows = CN.make_rows(m, kin, qpos, qvel, cc)
        res = S.newton_solve(M, qacc_smooth, rows,
                             jnp.zeros_like(qacc_smooth), s.iterations)
        return res.qacc.sum()

    def st_noslip(qpos, qvel, ctrl):
        import numpy as np
        kin = K.kinematics(m, qpos)
        M = D.crb(m, kin)
        vel = D.com_velocity(m, kin, qvel)
        qfrc_bias = D.bias_force(m, kin, vel, qvel)
        qfrc_passive = D.passive_force(m, qpos, qvel)
        act = A.actuation(m, qpos, qvel, ctrl)
        from mj_envs_tpu.physics.kernels import chol_solve
        qacc_smooth = chol_solve(
            M, act.qfrc_actuator + qfrc_passive - qfrc_bias)
        _, cc = C.collide(m, kin, ncmax)
        rows = CN.make_rows(m, kin, qpos, qvel, cc)
        res = S.newton_solve(M, qacc_smooth, rows,
                             jnp.zeros_like(qacc_smooth), s.iterations)
        nfl = int(np.sum(s.dof_hasfrictionloss))
        res = S.noslip(M, rows, res, nfl, ncmax, s.noslip_iterations)
        return res.qacc.sum()

    def st_substep(qpos, qvel, ctrl):
        from mj_envs_tpu.physics.model import make_data
        d = make_data(m, dtype=qpos.dtype)
        d = d.replace(qpos=qpos, qvel=qvel)
        d = pipeline.step(m, d, ctrl)
        return d.qpos.sum()

    return [("kinematics", st_kin), ("smooth(FK+CRB+act+solve)",
            st_smooth), ("collide", st_collide), ("rows", st_rows),
            ("newton(+prereqs)", st_newton), ("noslip(+prereqs)",
            st_noslip), ("full substep", st_substep)]


def time_fn(fn, args, reps=REPS):
    out = fn(*args)
    jax.block_until_ready(out)
    best = np.inf
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    env = envs.make(f"{TASK}-v0")
    print(f"backend={jax.default_backend()} envs={NUM_ENVS} task={TASK}",
          flush=True)
    key = jax.random.PRNGKey(0)
    st = jax.jit(jax.vmap(env.reset))(jax.random.split(key, NUM_ENVS))
    qpos = st.data.qpos
    qvel = st.data.qvel
    ctrl = jax.random.uniform(key, (NUM_ENVS, env.nu), qpos.dtype,
                              -1.0, 1.0)

    prof_dir = os.environ.get("PROFILE_DIR")
    rows = []
    for name, fn in make_stages(env):
        if AMORT > 1:
            f = jax.jit(jax.vmap(_amortized(fn, AMORT)))
            t = time_fn(f, (qpos, qvel, ctrl)) / AMORT
        else:
            f = jax.jit(jax.vmap(fn))
            t = time_fn(f, (qpos, qvel, ctrl))
        rows.append((name, t))
        print(f"{name:28s} {t * 1e3:9.2f} ms "
              f"({NUM_ENVS / t:12.0f} substep-equiv/s)", flush=True)

    # env-step (frame_skip substeps + obs/reward) and auto-reset step
    step_j = jax.jit(jax.vmap(env.step))
    t = time_fn(step_j, (st, ctrl))
    print(f"{'env.step (x frame_skip)':28s} {t * 1e3:9.2f} ms "
          f"({NUM_ENVS / t:12.0f} env-steps/s)", flush=True)
    sar_j = jax.jit(jax.vmap(env.step_auto_reset))
    t = time_fn(sar_j, (st, ctrl))
    print(f"{'env.step_auto_reset':28s} {t * 1e3:9.2f} ms "
          f"({NUM_ENVS / t:12.0f} env-steps/s)", flush=True)

    if prof_dir:
        with jax.profiler.trace(prof_dir):
            for _ in range(3):
                st2 = sar_j(st, ctrl)
            jax.block_until_ready(st2.obs)
        print(f"trace written to {prof_dir}", flush=True)


if __name__ == "__main__":
    main()
