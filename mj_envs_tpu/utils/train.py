"""Training loops — TPU-native counterpart of `mj_envs_vision/utils/
train.py`.

The reference alternates single-env rollout collection with torch updates
(`train_sb3_policy:32-90`, `train_policy:93-176`), timing phases with
PROF wall-clock brackets (`train.py:20,53-64,81-84`).  Here one PPO
"episode" is a fully jitted iteration over `num_envs` parallel envs
(rollout scan + GAE + minibatch epochs fused); the host loop only handles
cadence: evaluation every `test_interval`, checkpoints every
`checkpoint_interval`, metrics logging — mirroring the reference's
structure (train -> evaluate -> checkpoint) at batch scale.
"""
from __future__ import annotations

import os
import time
from typing import Dict, List, Optional

import numpy as np
import jax

from ..algos import ppo as PPO
from ..algos import networks as N
from ..envs.base import AdroitEnv
from . import checkpoint as CKPT
from .eval import make_evaluate

PROF = True


class Metrics:
    """Accumulating scalar metrics (reference `helpers.py:19-21`,
    `baselines.py:89-104`), written as CSV."""

    def __init__(self):
        self.rows: List[Dict[str, float]] = []

    def append(self, **kw: float):
        self.rows.append({k: float(v) for k, v in kw.items()})

    def save_csv(self, path: str):
        if not self.rows:
            return
        keys = sorted({k for r in self.rows for k in r})
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        with open(path, "w") as f:
            f.write(",".join(keys) + "\n")
            for r in self.rows:
                f.write(",".join(str(r.get(k, "")) for k in keys) + "\n")


def train_ppo_policy(config, env: AdroitEnv, out_dir: Optional[str] = None):
    """PPO training to `config.max_episodes` iterations.

    Returns (train_state, metrics).  Mirrors the reference cadence:
    eval every `test_interval`, checkpoint every `checkpoint_interval`.
    """
    out_dir = out_dir or (config.log_path or "results")
    cfg = PPO.PPOConfig(
        lr=config.learning_rate,
        n_steps=getattr(config, "n_steps", 64),
        n_minibatches=getattr(config, "n_minibatches", 8),
        n_epochs=getattr(config, "n_epochs", 4),
        gamma=getattr(config, "gamma", 0.99),
        gae_lambda=getattr(config, "gae_lambda", 0.95),
        clip_eps=getattr(config, "clip_eps", 0.2),
        max_grad_norm=float(config.grad_clip_norm),
    )
    num_envs = config.num_envs
    init_fn, train_iter_fn, act_fn = PPO.make_ppo(env, num_envs, cfg)

    key = jax.random.PRNGKey(config.seed)
    key, k_init, k_env, k_eval = jax.random.split(key, 4)
    train_state = init_fn(k_init)

    # Resume (reference baselines.py:149-161).
    latest = CKPT.latest(out_dir)
    if latest and config.models_path != "":
        train_state = CKPT.restore(latest, train_state)
        print(f"resumed from {latest}")

    env_state = jax.jit(jax.vmap(env.reset))(
        jax.random.split(k_env, num_envs))
    step = jax.jit(train_iter_fn, donate_argnums=(1,))

    def eval_policy(params, obs, ekey):
        mean, _, _ = N.actor_critic_apply(params, obs)
        return jax.numpy.clip(mean, -1.0, 1.0)

    evaluate = make_evaluate(env, eval_policy, env.MAX_EPISODE_STEPS)

    metrics = Metrics()
    sps_hist = []
    for episode in range(1, config.max_episodes + 1):
        t0 = time.time()
        train_state, env_state, m = step(train_state, env_state)
        jax.block_until_ready(m["mean_reward"])
        dt = time.time() - t0
        env_steps = cfg.n_steps * num_envs
        sps_hist.append(env_steps / dt)
        metrics.append(episode=episode, steps_per_s=env_steps / dt,
                       **{k: v for k, v in m.items()})

        if PROF and (episode % 10 == 0 or episode == 1):
            print(f"ep {episode:5d} reward {float(m['mean_reward']):8.3f} "
                  f"| {env_steps / dt:9.0f} env-steps/s "
                  f"(median {np.median(sps_hist):9.0f})", flush=True)

        if episode % config.test_interval == 0:
            res = evaluate(train_state.params, k_eval, count=10)
            metrics.append(episode=episode,
                           eval_reward=res.total_rewards.mean(),
                           eval_success=res.success_rate)
            print(f"  eval: reward {res.total_rewards.mean():8.1f} "
                  f"success {res.success_rate:5.1f}%", flush=True)

        if episode % config.checkpoint_interval == 0:
            path = CKPT.checkpoint_path(out_dir, episode)
            CKPT.save(path, train_state)

    metrics.save_csv(os.path.join(out_dir, "metrics.csv"))
    return train_state, metrics
