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
    qpos: np.ndarray              # (count, T, nq) — for offline replay /
                                  #  worst-trajectory rendering
    reward: np.ndarray            # (count, T) per-step rewards


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
            return (st, k), (st.obs, st.reward, st.goal_achieved, st.done,
                             st.data.qpos)

        (_, _), (obs, rew, goal, done, qpos) = jax.lax.scan(
            step_fn, (state, keys[0]), None, length=episode_length)
        return obs, rew, goal, done, qpos

    rollout_j = jax.jit(rollout)

    def evaluate(params, key, count: int = 10) -> EvalResult:
        keys = jax.random.split(key, count)
        return _finish_eval(env, *rollout_j(params, keys))

    return evaluate


def _finish_eval(env, obs, rew, goal, done, qpos) -> EvalResult:
    """Assemble an EvalResult from time-first scan outputs."""
    # scan stacks time-first -> (T, count); transpose to (count, T).
    rew = np.asarray(rew).T
    goal = np.asarray(goal).T
    done = np.asarray(done).T
    obs = np.asarray(obs).transpose(1, 0, 2)
    qpos = np.asarray(qpos).transpose(1, 0, 2)
    # Rewards stop accumulating after termination (pen drop), like the
    # reference's loop which breaks... the reference actually keeps
    # stepping (fixed length) — keep full sums for parity.
    total = rew.sum(axis=1)
    success_any = goal.any(axis=1)
    success_rate = env.evaluate_success(goal)
    return EvalResult(total_rewards=total, success_any=success_any,
                      success_rate=success_rate, goal_achieved=goal,
                      obs=obs, qpos=qpos, reward=rew)


def make_pixel_evaluate(penv, policy_apply: Callable, episode_length: int):
    """Evaluate a stateless pixel policy (the CNN-PPO family):
    policy_apply(params, pixels, key) -> action in [-1, 1].  Same fixed-
    length fresh-env protocol as `make_evaluate`, with on-device
    rendering feeding the policy each step."""
    env = penv.env
    v_reset = jax.vmap(env.reset)
    v_step = jax.vmap(env.step)
    v_render = jax.vmap(penv._render)

    def rollout(params, keys):
        state = v_reset(keys)
        pixels = v_render(state)

        def step_fn(carry, _):
            st, pix, k = carry
            k, ka = jax.random.split(k)
            action = policy_apply(params, pix, ka)
            st = v_step(st, action)
            return (st, v_render(st), k), (st.obs, st.reward,
                                           st.goal_achieved, st.done,
                                           st.data.qpos)

        (_, _, _), outs = jax.lax.scan(
            step_fn, (state, pixels, keys[0]), None, length=episode_length)
        return outs

    rollout_j = jax.jit(rollout)

    def evaluate(params, key, count: int = 10) -> EvalResult:
        keys = jax.random.split(key, count)
        return _finish_eval(env, *rollout_j(params, keys))

    return evaluate


def make_planet_evaluate(env, config, episode_length: int):
    """Evaluate a PlaNet policy with the belief-filtered act path — the
    reference evaluates PlaNet like any other policy
    (`mj_envs_vision/utils/eval.py:36-44`: `policy.act` = preprocess ->
    encoder -> RSSM filter -> CEM plan, `baselines.py:311-320`).

    Carries (belief h, state s, last action a) across the fixed-length
    rollout; all `count` eval envs filter and plan in one batch (the
    CEM's candidate rollouts batch over envs natively)."""
    from ..algos import planet as PL
    from ..envs.pixels import PixelObservationEnv
    from ..render.raster import images_to_observation

    penv = PixelObservationEnv(env)
    cfg = PL.cfg_from_config(config, env.nu)
    _, _, infer_step, plan = PL.make_planet(cfg)
    bit_depth = config.bit_depth
    v_reset = jax.vmap(env.reset)
    v_step = jax.vmap(env.step)
    v_render = jax.vmap(penv._render)

    def rollout(params, keys):
        count = keys.shape[0]
        st = v_reset(keys)
        pix = v_render(st)
        h = jnp.zeros((count, cfg.belief_size))
        s = jnp.zeros((count, cfg.state_size))
        a = jnp.zeros((count, env.nu))

        def step_fn(carry, _):
            st, pix, h, s, a, k = carry
            k, k1, k2, k3 = jax.random.split(k, 4)
            obs_pl = images_to_observation(pix, bit_depth, key=k1)
            h, s = infer_step(params, k2, h, s, a, obs_pl)
            a = plan(params, k3, h, s)
            st = v_step(st, a)
            return (st, v_render(st), h, s, a, k), (
                st.obs, st.reward, st.goal_achieved, st.done,
                st.data.qpos)

        (_, _, _, _, _, _), outs = jax.lax.scan(
            step_fn, (st, pix, h, s, a, keys[0]), None,
            length=episode_length)
        return outs

    rollout_j = jax.jit(rollout)

    def evaluate(params, key, count: int = 10) -> EvalResult:
        keys = jax.random.split(key, count)
        return _finish_eval(env, *rollout_j(params, keys))

    return evaluate


def load_planet_params(config, env):
    """Restore a PlaNet checkpoint's params with the shapes implied by
    `config` (saved by train_planet_policy as {"params", "opt_state"})."""
    import jax as _jax
    from ..algos import planet as PL
    from . import checkpoint as CKPT
    cfg = PL.cfg_from_config(config, env.nu)
    init_fn, _, _, _ = PL.make_planet(cfg)
    params0, _ = init_fn(_jax.random.PRNGKey(0))
    tree = CKPT.restore(config.models_path,
                        {"params": params0, "opt_state": None})
    return tree["params"]


def dapg_policy_apply(act_fn: Callable):
    """Wrap a DAPG deterministic policy into the evaluate() signature."""
    def apply(params, obs, key):
        del params, key
        return jnp.clip(jax.vmap(act_fn)(obs), -1.0, 1.0)
    return apply


def run_eval(config_path, policy_type="default", variation_type=None,
             episodes=5, out=None):
    """Eval protocol body (reference `mj_envs_vision/utils/eval.py:29-66`):
    per-episode reseed `seed + ep`, `evaluate(count=10)` per episode,
    worst-trajectory gif per episode, reward/success plots at the end.

    The reference saves `trajs[-1]` with a "select worst" comment
    (`eval.py:60`) — here the actually-worst (lowest total reward)
    trajectory is rendered, which is what that comment intends.
    """
    import os
    from mj_envs_tpu import envs
    from mj_envs_tpu.utils.config import load_config
    from mj_envs_tpu.utils import helpers as H
    from mj_envs_tpu import visualize as V

    config = load_config(config_path, policy_type)
    config.max_episodes = episodes
    config.variation_type = variation_type
    env = envs.make(config.env_name, variation_type=variation_type)
    out_path = out or os.path.dirname(config.models_path) or "results"
    os.makedirs(out_path, exist_ok=True)
    model_name = (os.path.basename(config.models_path or "golden")
                  .replace(".", "_") + "_var-"
                  + (variation_type or "fixed"))
    print(f"saving results to {out_path}")

    task = config.env_name.replace("-v0", "")
    if policy_type in ("default", "dapg"):
        from mj_envs_tpu.algos import dapg
        act_fn, _ = dapg.load_policy(task)
        apply = dapg_policy_apply(act_fn)
        params = None
        evaluate = make_evaluate(env, apply, env.MAX_EPISODE_STEPS)
    elif policy_type == "ppo" and getattr(config, "model_type",
                                          "mlp") == "cnn":
        # Pixel PPO (reference ActorCriticCnnPolicy, baselines.py:120-134).
        from mj_envs_tpu.algos import networks as N
        from mj_envs_tpu.utils import checkpoint as CKPT
        from mj_envs_tpu.envs.pixels import PixelObservationEnv
        params0 = N.cnn_actor_critic_init(jax.random.PRNGKey(0), env.nu)
        tree = CKPT.restore(config.models_path,
                            {"params": params0, "opt_state": None,
                             "key": None})
        params = tree["params"]

        def apply(params, pixels, key):
            mean, _, _ = N.cnn_actor_critic_apply(params, pixels)
            return jnp.clip(mean, -1.0, 1.0)

        evaluate = make_pixel_evaluate(PixelObservationEnv(env), apply,
                                       env.MAX_EPISODE_STEPS)
    elif policy_type == "ppo":
        from mj_envs_tpu.algos import networks as N
        from mj_envs_tpu.utils import checkpoint as CKPT
        params0 = N.actor_critic_init(jax.random.PRNGKey(0),
                                      env.OBS_DIM, env.nu, (64, 64))
        tree = CKPT.restore(config.models_path,
                            {"params": params0, "opt_state": None,
                             "key": None})
        params = tree["params"]

        def apply(params, obs, key):
            mean, _, _ = N.actor_critic_apply(params, obs)
            return jnp.clip(mean, -1.0, 1.0)

        evaluate = make_evaluate(env, apply, env.MAX_EPISODE_STEPS)
    elif policy_type == "planet":
        # Belief-filtered PlaNet act path (reference eval.py:36-44).
        params = load_planet_params(config, env)
        evaluate = make_planet_evaluate(
            env, config,
            config.max_episode_length // config.action_repeat)
    else:
        raise SystemExit(f"unsupported policy_type {policy_type}")
    total_rewards, successes = [], []
    for ep in range(episodes):
        key = jax.random.PRNGKey(config.seed + ep)   # reseed seed+ep
        res = evaluate(params, key, count=10)
        total_rewards.append((ep, res.total_rewards))
        successes.append((ep, res.success_any.astype(int)))
        worst = int(np.argmin(res.total_rewards))
        frames = V.render_state_trajectory(env, res.qpos[worst])
        H.visualise_trajectory(ep, frames, out_path, prefix=model_name)
        print(f"ep {ep}: reward {res.total_rewards.mean():.1f} "
              f"success {res.success_rate:.0f}% "
              f"(worst traj #{worst}: {res.total_rewards[worst]:.1f})")

    H.save_rewards_plot(
        total_rewards,
        os.path.join(out_path, f"{model_name}_eval_rewards.png"),
        "total rewards")
    H.save_rewards_plot(
        successes,
        os.path.join(out_path, f"{model_name}_eval_success.png"),
        "success rate")
    return out_path, model_name


def main():
    """Click wrapper over `run_eval`:

        python -m mj_envs_tpu.utils.eval --config_path cfg.json \
            [--policy_type dapg] [--episodes 5] [--variation_type pos]
    """
    import click

    @click.command()
    @click.option("--config_path", type=str, required=True)
    @click.option("--policy_type", type=str, default="default",
                  help="{default, dapg, ppo, planet}")
    @click.option("--variation_type", type=str, default=None)
    @click.option("--episodes", type=int, default=5)
    @click.option("--out", type=str, default=None)
    def cli(config_path, policy_type, variation_type, episodes, out):
        run_eval(config_path, policy_type, variation_type, episodes, out)

    cli()


if __name__ == "__main__":
    main()
