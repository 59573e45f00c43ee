"""Micro-profile of collide() internals at batch: narrowphase math vs
compaction vs downstream rows, amortized inside a lax.scan to cancel
dispatch/tunnel RTT.

    NUM_ENVS=1024 TASK=hammer AMORTIZE=20 python tools/profile_collide.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from mj_envs_tpu import envs
from mj_envs_tpu.physics import pipeline, kinematics as K
from mj_envs_tpu.physics import constraint as CN
from mj_envs_tpu.physics.collision import driver as C

NUM_ENVS = int(os.environ.get("NUM_ENVS", "1024"))
TASK = os.environ.get("TASK", "hammer")
REPS = int(os.environ.get("REPS", "5"))
AMORT = int(os.environ.get("AMORTIZE", "20"))


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


def amortized_batched(fn, k):
    """fn maps batched qpos -> scalar; scan k times with a value dep."""
    def wrapped(qpos, qvel):
        def body(carry, _):
            q, acc = carry
            o = fn(q, qvel)
            return (q + 1e-30 * o, acc + o), ()
        (_, acc), _ = jax.lax.scan(
            body, (qpos, jnp.zeros((), qpos.dtype)), (), length=k)
        return acc
    return wrapped


def main():
    env = envs.make(f"{TASK}-v0")
    m = env.model
    s = m.spec
    ncmax = pipeline._ncmax(s)
    print(f"backend={jax.default_backend()} envs={NUM_ENVS} task={TASK} "
          f"npair={s.npair} ncon_cap={s.ncon_cap} ncmax={ncmax}",
          flush=True)

    key = jax.random.PRNGKey(0)
    st = jax.jit(jax.vmap(env.reset))(jax.random.split(key, NUM_ENVS))
    qpos = st.data.qpos
    qvel = st.data.qvel

    def kin_only(qpos, qvel):
        kin = jax.vmap(lambda q: K.kinematics(m, q))(qpos)
        return kin.geom_xpos.sum()

    def np_only(qpos, qvel):
        kin = jax.vmap(lambda q: K.kinematics(m, q))(qpos)
        con = C._narrowphase_all_batched(m, kin, False)
        return con.dist.sum() + con.frame.sum()

    def np_compact(qpos, qvel):
        kin = jax.vmap(lambda q: K.kinematics(m, q))(qpos)
        _, cc = jax.vmap(lambda k2: C.collide(m, k2, ncmax))(kin)
        return cc.dist.sum() + cc.frame.sum()

    def np_rows(qpos, qvel):
        kin = jax.vmap(lambda q: K.kinematics(m, q))(qpos)
        _, cc = jax.vmap(lambda k2: C.collide(m, k2, ncmax))(kin)
        rows = jax.vmap(lambda k2, q, v, c: CN.make_rows(m, k2, q, v, c))(
            kin, qpos, qvel, cc)
        return rows.J.sum() + rows.aref.sum()

    for name, fn in [("kinematics", kin_only),
                     ("kin+narrowphase(batched)", np_only),
                     ("kin+collide(np+compact)", np_compact),
                     ("kin+collide+rows", np_rows)]:
        f = jax.jit(amortized_batched(fn, AMORT))
        t = time_fn(f, (qpos, qvel)) / AMORT
        print(f"{name:28s} {t * 1e3:9.2f} ms", flush=True)


if __name__ == "__main__":
    main()
