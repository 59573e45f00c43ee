"""Top-level training entry point (reference `mj_envs_vision/run.py`:
`python run.py [config.json] [policy_type]`).

    python -m mj_envs_tpu.run configs/hammer_ppo.json ppo

Policy types: ppo (native JAX PPO), npg (natural policy gradient / DAPG
family), sac (soft actor-critic), dapg (evaluate the pretrained golden
policy), planet (RSSM+CEM — pixel observations).
"""
from __future__ import annotations

import os
import sys
import time

import jax


def main(argv):
    from mj_envs_tpu import envs
    from mj_envs_tpu.utils.config import load_config, PPOConfig

    # Debug mode (SURVEY §5 sanitizer row): jax_debug_nans makes any
    # NaN-producing op under jit raise with a traceback instead of the
    # in-graph quarantine silently absorbing it (envs/base.py
    # step_auto_reset) — use for root-causing solver blow-ups.
    if os.environ.get("MJE_DEBUG_NANS", "") not in ("", "0"):
        jax.config.update("jax_debug_nans", True)

    config_path = argv[1] if len(argv) > 1 else None
    policy_type = argv[2] if len(argv) > 2 else "ppo"

    if config_path:
        config = load_config(config_path, policy_type)
    else:
        config = PPOConfig()
        config.env_name = "hammer-v0"
        config.max_episodes = 50
        config.test_interval = 25
        config.checkpoint_interval = 50
        config.num_envs = 256

    assert config.env_name, "config.env_name required"
    env = envs.make(config.env_name,
                    variation_type=config.variation_type or None)

    out_dir = config.log_path or f"results/{config.run_id}_{policy_type}"
    os.makedirs(out_dir, exist_ok=True)
    config.save(os.path.join(out_dir, "config.json"))

    t0 = time.time()
    if policy_type == "ppo":
        from mj_envs_tpu.utils.train import train_ppo_policy
        train_ppo_policy(config, env, out_dir)
    elif policy_type in ("dapg", "default"):
        from mj_envs_tpu.algos import dapg
        from mj_envs_tpu.utils.eval import make_evaluate, dapg_policy_apply
        task = config.env_name.replace("-v0", "")
        act_fn, _ = dapg.load_policy(task)
        evaluate = make_evaluate(env, dapg_policy_apply(act_fn),
                                 env.MAX_EPISODE_STEPS)
        res = evaluate(None, jax.random.PRNGKey(config.seed), count=10)
        print(f"dapg eval: reward {res.total_rewards.mean():.1f} "
              f"success {res.success_rate:.1f}%")
    elif policy_type == "npg":
        from mj_envs_tpu.utils.train import train_npg_policy
        train_npg_policy(config, env, out_dir)
    elif policy_type == "sac":
        from mj_envs_tpu.utils.train import train_sac_policy
        train_sac_policy(config, env, out_dir)
    elif policy_type == "planet":
        from mj_envs_tpu.utils.train import train_planet_policy
        train_planet_policy(config, env, out_dir)
    else:
        raise ValueError(f"unknown policy type {policy_type}")
    print(f"done in {time.time() - t0:.0f}s -> {out_dir}")


if __name__ == "__main__":
    main(sys.argv)
