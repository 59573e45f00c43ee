"""Attribute newton_solve cost at batch: iteration slope + per-piece
costs (H build, SPD solve, linesearch) on real constraint rows from a
settled hammer state.

    NUM_ENVS=4096 python tools/profile_newton.py
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
from mj_envs_tpu.physics import kernels as KR

NUM_ENVS = int(os.environ.get("NUM_ENVS", "4096"))
K_AMORT = int(os.environ.get("AMORTIZE", "10"))


def block_measure(fn, *args, k=K_AMORT):
    o = fn(*args)
    jax.block_until_ready(o)
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(k)]
    jax.block_until_ready(outs)
    return (time.perf_counter() - t0) / k


def main():
    env = envs.make("hammer-v0")
    m = env.model
    s = m.spec
    ncmax = pipeline._ncmax(s)
    print(f"backend={jax.default_backend()} envs={NUM_ENVS}", flush=True)

    # Settle 10 env-steps so the constraint set is contact-rich.
    key = jax.random.PRNGKey(0)
    st = jax.jit(jax.vmap(env.reset))(jax.random.split(key, NUM_ENVS))
    stepj = jax.jit(jax.vmap(env.step))
    for _ in range(10):
        st = stepj(st, jnp.zeros((NUM_ENVS, env.nu)))
    qpos, qvel = st.data.qpos, st.data.qvel
    ctrl = jax.random.uniform(key, (NUM_ENVS, env.nu), jnp.float32, -1, 1)

    @jax.jit
    def prereqs(qpos, qvel, ctrl):
        def one(qpos, qvel, ctrl):
            kin = K.kinematics(m, qpos)
            M = D.crb(m, kin)
            vel = D.com_velocity(m, kin, qvel)
            qfrc_bias = D.bias_force(m, kin, vel, qvel)
            qfrc_passive = D.passive_force(m, qpos, qvel)
            act = A.actuation(m, qpos, qvel, ctrl)
            qacc_smooth = KR.chol_solve(
                M, act.qfrc_actuator + qfrc_passive - qfrc_bias)
            _, cc = C.collide(m, kin, ncmax)
            rows = CN.make_rows(m, kin, qpos, qvel, cc)
            return M, qacc_smooth, rows
        return jax.vmap(one)(qpos, qvel, ctrl)

    M, qacc_smooth, rows = jax.block_until_ready(
        prereqs(qpos, qvel, ctrl))
    warm = jnp.zeros_like(qacc_smooth)
    nefc, nv = rows.J.shape[1], qacc_smooth.shape[1]
    print(f"nefc={nefc} nv={nv}", flush=True)

    for iters in (1, 2, 5, 10, 20):
        f = jax.jit(lambda M, qs, rows, w, it=iters: jax.vmap(
            lambda *xs: S.newton_solve(*xs, it))(M, qs, rows, w).qacc)
        t = block_measure(f, M, qacc_smooth, rows, warm)
        print(f"newton iterations<={iters:2d}   {t*1e3:8.2f} ms", flush=True)

    # isolated pieces at one-iteration shape
    f_quad = rows.D * 0.0
    w = jnp.where(rows.active, rows.D, 0.0)

    def h_build(M, J, w):
        return M + jnp.einsum("bev,be,bew->bvw", J, w, J)
    t = block_measure(jax.jit(h_build), M, rows.J, w)
    print(f"{'H build (einsum)':22s} {t*1e3:8.2f} ms", flush=True)

    H = jax.jit(h_build)(M, rows.J, w)
    g = qacc_smooth
    t = block_measure(jax.jit(jax.vmap(KR.chol_solve)), H, g)
    print(f"{'chol_solve (pallas)':22s} {t*1e3:8.2f} ms", flush=True)

    jar = jnp.einsum("bev,bv->be", rows.J, qacc_smooth) - rows.aref
    Jp = jar * 0.5
    c1 = -jnp.ones((NUM_ENVS,), jnp.float32)
    c2 = jnp.ones((NUM_ENVS,), jnp.float32)
    ls = jax.jit(jax.vmap(KR.linesearch_cached(12, 16)))
    t = block_measure(ls, jar, Jp, rows.D, rows.floss, rows.active, c1, c2)
    print(f"{'linesearch (pallas)':22s} {t*1e3:8.2f} ms", flush=True)

    def jmatvecs(J, p):
        return jnp.einsum("bev,bv->be", J, p)
    t = block_measure(jax.jit(jmatvecs), rows.J, qacc_smooth)
    print(f"{'J @ p matvec':22s} {t*1e3:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
