"""Attribute env.step cost: batched-var substeps vs obs/reward, amortized.

    NUM_ENVS=1024 TASK=hammer AMORTIZE=10 python tools/profile_envstep.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from mj_envs_tpu import envs
from mj_envs_tpu.envs import base as EB
from mj_envs_tpu.physics import pipeline

NUM_ENVS = int(os.environ.get("NUM_ENVS", "1024"))
TASK = os.environ.get("TASK", "hammer")
REPS = int(os.environ.get("REPS", "5"))
AMORT = int(os.environ.get("AMORTIZE", "10"))


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


def amortized(fn, k):
    def wrapped(st, a):
        def body(carry, _):
            s, acc = carry
            o = fn(s, a)
            return (s.replace(data=s.data.replace(
                qpos=s.data.qpos + 1e-30 * o)), acc + o), ()
        (_, acc), _ = jax.lax.scan(
            body, (st, jnp.zeros((), st.data.qpos.dtype)), (), length=k)
        return acc
    return wrapped


def main():
    env = envs.make(f"{TASK}-v0")
    print(f"backend={jax.default_backend()} envs={NUM_ENVS} task={TASK}",
          flush=True)
    key = jax.random.PRNGKey(0)
    st = jax.jit(jax.vmap(env.reset))(jax.random.split(key, NUM_ENVS))
    a = jax.random.uniform(key, (NUM_ENVS, env.nu), st.data.qpos.dtype,
                           -1.0, 1.0)

    def substeps_only(s, act):
        model = EB._apply_var(env.model, s.var)
        ctrl = env.act_mid + jnp.clip(act, -1, 1) * env.act_rng
        def sub(d, _):
            d = pipeline.step(model, d, ctrl)
            return d, ()
        d, _ = jax.lax.scan(sub, s.data, (), length=env.FRAME_SKIP)
        return d.qpos.sum()

    def one_substep(s, act):
        model = EB._apply_var(env.model, s.var)
        ctrl = env.act_mid + jnp.clip(act, -1, 1) * env.act_rng
        d = pipeline.step(model, s.data, ctrl)
        return d.qpos.sum()

    def obs_reward_only(s, act):
        model = EB._apply_var(env.model, s.var)
        obs = env._obs(model, s.data)
        reward, done, goal = env._reward_done(model, s.data)
        return obs.sum() + reward + goal.astype(obs.dtype)

    def full_step(s, act):
        out = env.step(s, act)
        return out.obs.sum() + out.reward

    def full_sar(s, act):
        out = env.step_auto_reset(s, act)
        return out.obs.sum() + out.reward

    def reset_only(s, act):
        out = env.reset(s.key)
        return out.obs.sum()

    for name, fn in [("1 substep (batched var)", one_substep),
                     ("5 substeps (batched var)", substeps_only),
                     ("obs+reward only", obs_reward_only),
                     ("env.step", full_step),
                     ("env.step_auto_reset", full_sar),
                     ("reset only", reset_only)]:
        f = jax.jit(jax.vmap(amortized(fn, AMORT), in_axes=(0, 0)))
        t = time_fn(f, (st, a)) / AMORT
        print(f"{name:28s} {t * 1e3:9.2f} ms", flush=True)


if __name__ == "__main__":
    main()
