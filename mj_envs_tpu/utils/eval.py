"""Evaluation — batched TPU equivalent of `mj_envs_vision/utils/eval.py`.

The reference's `evaluate` (`eval.py:69-97`) builds a FRESH env per
rollout, runs fixed-length episodes (max_episode_length // action_repeat),
accumulates total reward and `success |= goal_achieved`, and returns
trajectory lists.  Here the same protocol runs as ONE jitted batched
rollout: `count` envs in parallel, fresh reset each, fixed length, no
auto-reset (matching the reference's fixed-length semantics).

The env-level success metric (% of paths with > SUCCESS_STEPS
goal_achieved steps — `hammer_v0.py:167-175`, `pen_v0.py:180-188`) is
computed from the same rollout.
"""
from __future__ import annotations

from typing import Callable, Dict, NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from ..envs.base import AdroitEnv


class EvalResult(NamedTuple):
    total_rewards: np.ndarray     # (count,)
    success_any: np.ndarray       # (count,) bool — reference `success`
    success_rate: float           # evaluate_success percentage
    goal_achieved: np.ndarray     # (count, T) bool
    obs: np.ndarray               # (count, T, obs_dim) — trajectories


def make_evaluate(env: AdroitEnv, policy_apply: Callable,
                  episode_length: int, deterministic: bool = True):
    """Returns a jitted `evaluate(params, key, count)`-style closure.

    policy_apply(params, obs, key) -> action in [-1, 1].
    """
    v_reset = jax.vmap(env.reset)
    v_step = jax.vmap(env.step)   # fixed-length: no auto-reset (eval.py:84)

    def rollout(params, keys):
        state = v_reset(keys)

        def step_fn(carry, _):
            st, k = carry
            k, ka = jax.random.split(k)
            action = policy_apply(params, st.obs, ka)
            st = v_step(st, action)
            return (st, k), (st.obs, st.reward, st.goal_achieved, st.done)

        (_, _), (obs, rew, goal, done) = jax.lax.scan(
            step_fn, (state, keys[0]), None, length=episode_length)
        return obs, rew, goal, done

    rollout_j = jax.jit(rollout)

    def evaluate(params, key, count: int = 10) -> EvalResult:
        keys = jax.random.split(key, count)
        obs, rew, goal, done = rollout_j(params, keys)
        # scan stacks time-first -> (T, count); transpose to (count, T).
        rew = np.asarray(rew).T
        goal = np.asarray(goal).T
        done = np.asarray(done).T
        obs = np.asarray(obs).transpose(1, 0, 2)
        # Rewards stop accumulating after termination (pen drop), like the
        # reference's loop which breaks... the reference actually keeps
        # stepping (fixed length) — keep full sums for parity.
        total = rew.sum(axis=1)
        success_any = goal.any(axis=1)
        success_rate = env.evaluate_success(goal)
        return EvalResult(total_rewards=total, success_any=success_any,
                          success_rate=success_rate, goal_achieved=goal,
                          obs=obs)

    return evaluate


def dapg_policy_apply(act_fn: Callable):
    """Wrap a DAPG deterministic policy into the evaluate() signature."""
    def apply(params, obs, key):
        del params, key
        return jnp.clip(jax.vmap(act_fn)(obs), -1.0, 1.0)
    return apply
