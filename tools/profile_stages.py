"""Per-stage substep timing at batch N on the current backend.

Times each pipeline stage as its own jitted+vmapped program (stage inputs
precomputed), so the numbers are per-stage device times, not trace
artifacts.  Usage:  N=1024 python tools/profile_stages.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from mj_envs_tpu import envs
from mj_envs_tpu.physics import actuation as A
from mj_envs_tpu.physics import dynamics as D
from mj_envs_tpu.physics import kinematics as K
from mj_envs_tpu.physics import constraint as CN
from mj_envs_tpu.physics import solver as S
from mj_envs_tpu.physics.collision import driver as C
from mj_envs_tpu.physics import pipeline as P

N = int(os.environ.get("N", "1024"))
TASK = os.environ.get("TASK", "hammer-v0")


def timeit(name, fn, *args, reps=5):
    fn_j = jax.jit(fn)
    out = fn_j(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn_j(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps
    print(f"{name:28s} {dt * 1e3:9.3f} ms", flush=True)
    return out


def main():
    env = envs.make(TASK)
    m = env.model
    s = m.spec
    key = jax.random.PRNGKey(0)
    state = jax.jit(jax.vmap(env.reset))(jax.random.split(key, N))
    qpos = state.data.qpos + 0.01
    qvel = jnp.zeros_like(state.data.qvel) + 0.1
    ctrl = jnp.zeros((N, s.nu), qpos.dtype)
    warm = jnp.zeros_like(qvel)
    qfrc_applied = jnp.zeros_like(qvel)
    ncmax = P._ncmax(s)

    print(f"task={TASK} N={N} backend={jax.default_backend()} "
          f"dtype={qpos.dtype}", flush=True)

    kin = timeit("kinematics", jax.vmap(lambda q: K.kinematics(m, q)), qpos)
    M = timeit("crb", jax.vmap(lambda k: D.crb(m, k)), kin)
    vel = timeit("com_velocity",
                 jax.vmap(lambda k, v: D.com_velocity(m, k, v)), kin, qvel)
    bias = timeit("bias_force",
                  jax.vmap(lambda k, ve, v: D.bias_force(m, k, ve, v)),
                  kin, vel, qvel)
    act = timeit("actuation",
                 jax.vmap(lambda q, v, c: A.actuation(m, q, v, c)),
                 qpos, qvel, ctrl)
    qfrc_smooth = act.qfrc_actuator - bias

    def smooth_solve(M, f):
        return jax.scipy.linalg.cho_solve((jnp.linalg.cholesky(M), True), f)
    qacc_smooth = timeit("cho_solve(smooth)", jax.vmap(smooth_solve),
                         M, qfrc_smooth)

    cf, cc = timeit("collide", jax.vmap(lambda k: C.collide(m, k, ncmax)),
                    kin)
    rows = timeit("make_rows",
                  jax.vmap(lambda k, q, v, c: CN.make_rows(m, k, q, v, c)),
                  kin, qpos, qvel, cc)
    solve = timeit("newton_solve",
                   jax.vmap(lambda Mi, qs, r, w: S.newton_solve(
                       Mi, qs, r, w, iterations=s.iterations)),
                   M, qacc_smooth, rows, warm)
    nfl = int(np.sum(s.dof_hasfrictionloss))
    timeit("noslip",
           jax.vmap(lambda Mi, r, sv: S.noslip(
               Mi, r, sv, nfl, ncmax, s.noslip_iterations)),
           M, rows, solve)

    def integrate(M, qacc, qpos, qvel):
        h = jnp.asarray(s.timestep, qpos.dtype)
        MhB = M + h * jnp.diag(m.dof_damping)
        qacc_i = jax.scipy.linalg.cho_solve(
            (jnp.linalg.cholesky(MhB), True), M @ qacc)
        qv = qvel + h * qacc_i
        return qpos + h * qv, qv
    timeit("integrate(implicit)", jax.vmap(integrate), M, solve.qacc,
           qpos, qvel)

    def full(qpos, qvel, ctrl, warm, qfa):
        return P.forward_core(m, qpos, qvel, ctrl, warm, qfa).qacc
    timeit("TOTAL forward_core", jax.vmap(full), qpos, qvel, ctrl, warm,
           qfrc_applied, reps=3)

    def substep(d, c):
        return P.step(m, d, c)
    timeit("TOTAL step", jax.vmap(substep), state.data, ctrl, reps=3)


if __name__ == "__main__":
    main()
