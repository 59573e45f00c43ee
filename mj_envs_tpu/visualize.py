"""Policy visualization CLI — counterpart of the reference's
`mj_envs_vision/utils/visualize_env.py`.

    python -m mj_envs_tpu.visualize --env_name hammer-v0 \
        [--policy ckpt-or-pickle] [--episodes 2] [--seed 123] \
        [--variation_type mass] [--out results/vis]

Reference behaviors kept:
* policy type sniffed from the policy filename ("planet" -> PlaNet
  checkpoint, "ppo" -> PPO checkpoint, anything else -> DAPG pickle,
  none -> the pretrained DAPG golden policy) (`visualize_env.py:37-47`).
* offscreen `record_policy` path (`visualize_env.py:109-140`): per
  episode, rollout the policy, save `visualise_<env>_<policy>_<k>.gif`
  plus a reward plot with mean/median/sigma bands (`helpers.py:103-120`).

Deviation (documented): there is no on-TPU GUI viewer — the reference's
GLFW `visualise_policy` mode (`:75-104`) maps to this offscreen recorder
(SURVEY.md §7 non-goals).  Frames come from the on-device rasterizer at
128x128 (the reference's crop size) rather than GL.
"""
from __future__ import annotations

import os
import sys

import numpy as np

import click


def _rollout_frames(env, act_fn, key, max_steps: int):
    """Single-env rollout with per-step 128x128 rendering."""
    import jax
    import jax.numpy as jnp
    from mj_envs_tpu.envs.pixels import PixelObservationEnv

    penv = PixelObservationEnv(env, height=128, width=128)
    reset_j = jax.jit(penv.reset)
    step_j = jax.jit(penv.step)
    act_j = jax.jit(act_fn)

    ps = reset_j(key)
    frames = [np.asarray(ps.pixels)]
    rewards = []
    for _ in range(max_steps):
        a = act_j(ps.state.obs)
        ps = step_j(ps, jnp.clip(a, -1.0, 1.0))
        frames.append(np.asarray(ps.pixels))
        rewards.append(float(ps.state.reward))
        if bool(ps.state.done):
            break
    return frames, rewards


def _rollout_frames_planet(env, config, params, key, max_steps: int):
    """Single-env PlaNet rollout with 128x128 frames: the planner sees
    the reference's 64x64 preprocessed obs (resize + bit-depth chain)
    while the gif gets the full crop — mirroring the reference's
    `visualize_env.py:37-47` planet path (act = preprocess -> encoder ->
    RSSM filter -> CEM plan, `baselines.py:311-320`)."""
    import jax
    import jax.numpy as jnp
    from mj_envs_tpu.envs.pixels import PixelObservationEnv
    from mj_envs_tpu.algos import planet as PL
    from mj_envs_tpu.render.raster import images_to_observation, resize_half

    penv = PixelObservationEnv(env, height=128, width=128)
    cfg = PL.cfg_from_config(config, env.nu)
    _, _, infer_step, plan = PL.make_planet(cfg)
    infer_j, plan_j = jax.jit(infer_step), jax.jit(plan)
    reset_j, step_j = jax.jit(penv.reset), jax.jit(penv.step)
    resize_j = jax.jit(resize_half)

    ps = reset_j(key)
    h = jnp.zeros((1, cfg.belief_size))
    s = jnp.zeros((1, cfg.state_size))
    a = jnp.zeros((1, env.nu))
    frames = [np.asarray(ps.pixels)]
    rewards = []
    for _ in range(max_steps):
        key, k1, k2, k3 = jax.random.split(key, 4)
        obs_pl = images_to_observation(resize_j(ps.pixels),
                                       config.bit_depth, key=k1)[None]
        h, s = infer_j(params, k2, h, s, a, obs_pl)
        a = plan_j(params, k3, h, s)
        ps = step_j(ps, a[0])
        frames.append(np.asarray(ps.pixels))
        rewards.append(float(ps.state.reward))
        if bool(ps.state.done):
            break
    return frames, rewards


def render_state_trajectory(env, qpos_traj, height: int = 128,
                            width: int = 128):
    """Re-render a recorded qpos trajectory (T, nq) offline -> list of
    (H, W, 3) frames.  Used by the eval CLI to save the worst
    trajectory's gif without rendering during the batched rollout."""
    import jax
    import jax.numpy as jnp
    from mj_envs_tpu.envs.pixels import PixelObservationEnv
    from mj_envs_tpu.physics import kinematics as K
    from mj_envs_tpu.render import raster

    penv = PixelObservationEnv(env, height=height, width=width)

    def frame(qpos):
        kin = K.kinematics(env.model, qpos)
        return raster.render(env.model, kin.geom_xpos, kin.geom_xmat,
                             penv.camera, height=height, width=width)

    # lax.map (sequential), NOT vmap: vmapping the ray-caster over all T
    # frames at once multiplies every per-geom (H, W) hit buffer by T —
    # GBs of XLA temporaries for a 200-step trajectory on a small host —
    # and recompiles per distinct T.  Sequential mapping keeps peak
    # memory at one frame; the offline gif path is not latency-critical.
    frames = jax.jit(lambda q: jax.lax.map(frame, q))(jnp.asarray(qpos_traj))
    return [np.asarray(f) for f in frames]


def _load_policy(policy_path, env, task):
    """Reference policy-type sniffing (`visualize_env.py:37-47`)."""
    import jax.numpy as jnp
    from mj_envs_tpu.algos import dapg

    if policy_path is None or "dapg" in str(policy_path) \
            or str(policy_path).endswith(".pickle"):
        if policy_path and policy_path.endswith(".pickle"):
            params = dapg.load_dapg_params(policy_path)
            act = dapg.make_policy(params)
            return lambda obs: act(obs), "dapg"
        act, _ = dapg.load_policy(task)
        return lambda obs: act(obs), "dapg-golden"
    # (planet checkpoints are dispatched in main() before this — the CEM
    # act path is stateful and handled by _rollout_frames_planet.)
    # PPO checkpoint (msgpack of TrainState).
    from mj_envs_tpu.algos import networks as N
    from mj_envs_tpu.algos.ppo import PPOConfig as _C  # noqa: F401
    from mj_envs_tpu.utils import checkpoint as CKPT
    import jax
    params0 = N.actor_critic_init(jax.random.PRNGKey(0), env.OBS_DIM,
                                  env.nu, (64, 64))
    tree = CKPT.restore(policy_path, {"params": params0, "opt_state": None,
                                      "key": None})
    params = tree["params"]

    def act(obs):
        mean, _, _ = N.actor_critic_apply(params, obs)
        return mean
    return act, "ppo"


@click.command(help=__doc__)
@click.option("--env_name", type=str, required=True)
@click.option("--policy", type=str, default=None,
              help="path to a policy checkpoint/pickle (default: "
                   "pretrained DAPG golden policy)")
@click.option("--seed", type=int, default=123)
@click.option("--episodes", type=int, default=1)
@click.option("--variation_type", type=str, default=None)
@click.option("--out", type=str, default="results/vis")
@click.option("--config_path", type=str, default=None,
              help="run config JSON (required for planet checkpoints "
                   "with non-default model sizes)")
def main(env_name, policy, seed, episodes, variation_type, out,
         config_path):
    import jax
    from mj_envs_tpu import envs
    from mj_envs_tpu.utils import helpers as H

    env = envs.make(env_name, variation_type=variation_type)
    task = env_name.replace("-v0", "")

    planet_cfg = None
    if policy and "planet" in str(policy):
        # Reference filename sniffing routes *planet* checkpoints to the
        # belief-filtered CEM act path (`visualize_env.py:37-47`).
        from mj_envs_tpu.utils.config import load_config, PlanetConfig
        from mj_envs_tpu.utils.eval import load_planet_params
        planet_cfg = (load_config(config_path, "planet") if config_path
                      else PlanetConfig())
        planet_cfg.models_path = policy
        planet_params = load_planet_params(planet_cfg, env)
        policy_name = "planet"
    else:
        act_fn, policy_name = _load_policy(policy, env, task)
    os.makedirs(out, exist_ok=True)
    print(f"saving renderings to {out}")

    all_rewards = []
    for k in range(episodes):
        key = jax.random.PRNGKey(seed + k)
        if planet_cfg is not None:
            frames, rewards = _rollout_frames_planet(
                env, planet_cfg, planet_params, key,
                planet_cfg.max_episode_length // planet_cfg.action_repeat)
        else:
            frames, rewards = _rollout_frames(env, act_fn, key,
                                              env.MAX_EPISODE_STEPS)
        gif = os.path.join(
            out, f"visualise_{env_name}_{policy_name}_{k}.gif")
        H.save_as_gif(frames, gif)
        all_rewards.append((k, float(np.sum(rewards))))
        print(f"episode {k}: total reward {np.sum(rewards):.1f} "
              f"({len(frames)} frames) -> {gif}")

    H.save_rewards_plot(all_rewards,
                        os.path.join(out, f"rewards_{env_name}.png"))
    print("done")


if __name__ == "__main__":
    main()
