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


class ProfilerHook:
    """`jax.profiler` trace over a window of training episodes (SURVEY
    §5 tracing row — the reference only has PROF wall-clock brackets,
    `mj_envs_vision/utils/train.py:20,53-64`).  Enabled by setting
    MJE_PROFILE_DIR; traces episodes 2..3 so the capture shows
    steady-state device work rather than the episode-1 XLA compile.
    View with TensorBoard's profile plugin or xprof."""

    START_EP, STOP_EP = 2, 3

    def __init__(self):
        self.dir = os.environ.get("MJE_PROFILE_DIR", "")
        self.active = False

    def before(self, episode: int):
        if self.dir and not self.active and episode == self.START_EP:
            jax.profiler.start_trace(self.dir)
            self.active = True

    def after(self, episode: int):
        if self.active and episode >= self.STOP_EP:
            jax.profiler.stop_trace()
            self.active = False
            print(f"profiler trace written to {self.dir}", flush=True)


class Metrics:
    """Accumulating scalar metrics (reference `helpers.py:19-21`,
    `baselines.py:89-104`), written as CSV and, when `tb_dir` is given,
    streamed to TensorBoard event files (the reference routes its
    `config.log_path` to SB3's `tensorboard_log`, `baselines.py:134`;
    its own loops carry "TODO: dump metrics to tensorboard",
    `train.py:72,129,150` — implemented here)."""

    def __init__(self, tb_dir: Optional[str] = None):
        self.rows: List[Dict[str, float]] = []
        self._tb = None
        if tb_dir:
            try:
                from torch.utils.tensorboard import SummaryWriter
                self._tb = SummaryWriter(log_dir=tb_dir)
            except Exception as e:   # tensorboard optional at runtime
                print(f"tensorboard writer unavailable: {e}")

    def append(self, **kw: float):
        self.rows.append({k: float(v) for k, v in kw.items()})
        if self._tb is not None:
            step = int(kw.get("episode", len(self.rows)))
            for k, v in kw.items():
                if k != "episode":
                    self._tb.add_scalar(k, float(v), step)

    def close(self):
        if self._tb is not None:
            self._tb.flush()
            self._tb.close()
            self._tb = None

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
    model_type = getattr(config, "model_type", "mlp") or "mlp"

    key = jax.random.PRNGKey(config.seed)
    key, k_init, k_env, k_eval = jax.random.split(key, 4)

    if model_type == "cnn":
        # Pixel PPO (reference `config.model_type == "cnn"` ->
        # ActorCriticCnnPolicy over pixels, baselines.py:120-134).
        from ..envs.pixels import PixelObservationEnv
        from .eval import make_pixel_evaluate
        penv = PixelObservationEnv(env)
        init_fn, train_iter_fn, act_fn = PPO.make_pixel_ppo(
            penv, num_envs, cfg)
        env_state = jax.jit(jax.vmap(penv.reset))(
            jax.random.split(k_env, num_envs))

        def eval_policy(params, pixels, ekey):
            mean, _, _ = N.cnn_actor_critic_apply(params, pixels)
            return jax.numpy.clip(mean, -1.0, 1.0)

        evaluate = make_pixel_evaluate(penv, eval_policy,
                                       env.MAX_EPISODE_STEPS)
    else:
        init_fn, train_iter_fn, act_fn = PPO.make_ppo(env, num_envs, cfg)
        env_state = jax.jit(jax.vmap(env.reset))(
            jax.random.split(k_env, num_envs))

        def eval_policy(params, obs, ekey):
            mean, _, _ = N.actor_critic_apply(params, obs)
            return jax.numpy.clip(mean, -1.0, 1.0)

        evaluate = make_evaluate(env, eval_policy, env.MAX_EPISODE_STEPS)

    train_state = init_fn(k_init)

    # Resume (reference baselines.py:149-161).
    latest = CKPT.latest(out_dir)
    if latest and config.models_path != "":
        train_state = CKPT.restore(latest, train_state)
        print(f"resumed from {latest}")

    step = jax.jit(train_iter_fn, donate_argnums=(1,))

    metrics = Metrics(tb_dir=out_dir)
    prof = ProfilerHook()
    sps_hist = []
    for episode in range(1, config.max_episodes + 1):
        prof.before(episode)
        t0 = time.time()
        train_state, env_state, m = step(train_state, env_state)
        jax.block_until_ready(m["mean_reward"])
        dt = time.time() - t0
        prof.after(episode)
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
    metrics.close()
    return train_state, metrics


def _train_generic(config, env: AdroitEnv, out_dir: str, make_algo,
                   eval_apply, name: str):
    """Shared host loop for the NPG/SAC learners: jitted train_iter +
    reference cadence (eval every test_interval, checkpoint every
    checkpoint_interval) — same skeleton as train_ppo_policy."""
    num_envs = config.num_envs
    init_fn, train_iter_fn, act_fn = make_algo()

    key = jax.random.PRNGKey(config.seed)
    key, k_init, k_env, k_eval = jax.random.split(key, 4)
    state = init_fn(k_init)
    env_state = jax.jit(jax.vmap(env.reset))(
        jax.random.split(k_env, num_envs))
    step = jax.jit(train_iter_fn, donate_argnums=(0, 1))
    evaluate = make_evaluate(env, eval_apply, env.MAX_EPISODE_STEPS)

    metrics = Metrics(tb_dir=out_dir)
    prof = ProfilerHook()
    for episode in range(1, config.max_episodes + 1):
        prof.before(episode)
        t0 = time.time()
        state, env_state, m = step(state, env_state)
        jax.block_until_ready(m["mean_reward"])
        dt = time.time() - t0
        prof.after(episode)
        metrics.append(episode=episode,
                       **{k: float(v) for k, v in m.items()})
        if PROF and (episode % 10 == 0 or episode == 1):
            print(f"{name} ep {episode:5d} reward "
                  f"{float(m['mean_reward']):8.3f} ({dt:.2f}s/it)",
                  flush=True)
        if episode % config.test_interval == 0:
            res = evaluate(_algo_eval_params(state), k_eval, count=10)
            metrics.append(episode=episode,
                           eval_reward=res.total_rewards.mean(),
                           eval_success=res.success_rate)
            print(f"  eval: reward {res.total_rewards.mean():8.1f} "
                  f"success {res.success_rate:5.1f}%", flush=True)
        if episode % config.checkpoint_interval == 0:
            CKPT.save(CKPT.checkpoint_path(out_dir, episode), state)

    metrics.save_csv(os.path.join(out_dir, "metrics.csv"))
    metrics.close()
    return state, metrics


def _algo_eval_params(state):
    """Evaluation params of an NPG/SAC state (the actor pytree)."""
    if hasattr(state, "actor"):
        return state.actor
    return state.params


def train_npg_policy(config, env: AdroitEnv, out_dir: Optional[str] = None,
                     demos=None):
    """NPG/DAPG training (`algos/npg.py` — the learner family the
    reference's pretrained Adroit experts came from)."""
    from ..algos import npg as NPG
    out_dir = out_dir or (config.log_path or "results")
    cfg = NPG.NPGConfig(
        n_steps=getattr(config, "n_steps", 64),
        normalized_step_size=getattr(config, "normalized_step_size", 0.1),
        gamma=getattr(config, "gamma", 0.995),
        gae_lambda=getattr(config, "gae_lambda", 0.97))
    make = lambda: NPG.make_npg(env, config.num_envs, cfg, demos=demos)

    def eval_apply(params, obs, key):
        mean = N.mlp_apply(params["actor"], obs)
        return jax.numpy.clip(mean, -1.0, 1.0)

    return _train_generic(config, env, out_dir, make, eval_apply, "npg")


def train_sac_policy(config, env: AdroitEnv, out_dir: Optional[str] = None):
    """SAC training (`algos/sac.py`)."""
    from ..algos import sac as SAC
    out_dir = out_dir or (config.log_path or "results")
    cfg = SAC.SACConfig(
        lr=config.learning_rate,
        batch_size=getattr(config, "batch_size", 256) or 256)
    make = lambda: SAC.make_sac(env, config.num_envs, cfg)

    def eval_apply(actor, obs, key):
        out = N.mlp_apply(actor, obs, activation=jax.nn.relu)
        return jax.numpy.tanh(out[..., :env.nu])

    return _train_generic(config, env, out_dir, make, eval_apply, "sac")


def train_planet_policy(config, env, out_dir: Optional[str] = None):
    """PlaNet training (reference `train_policy`, train.py:93-176):
    seed replay with random-action episodes until >= max(batch, chunk)
    steps (:112-123), then per episode: `sample_iters` gradient steps on
    sampled chunks (:23-29) -> one exploration rollout
    (`collect_experience`, :179-195) -> periodic eval/checkpoint.

    Observations are on-device rendered 64x64 pixels through the
    reference's quantization chain (bit_depth, config.py:41)."""
    import jax
    import jax.numpy as jnp
    from ..algos import planet as PL
    from ..algos import replay as RP
    from ..envs.pixels import PixelObservationEnv

    out_dir = out_dir or (config.log_path or "results")
    penv = PixelObservationEnv(env)
    cfg = PL.cfg_from_config(config, env.nu)
    init_fn, update_fn, infer_step, plan = PL.make_planet(cfg)

    key = jax.random.PRNGKey(config.seed)
    key, ki = jax.random.split(key)
    params, opt_state = init_fn(ki)
    mem = RP.ExperienceReplay(
        config.experience_size, (64, 64, 3), env.nu,
        bit_depth=config.bit_depth, seed=config.seed)

    update_j = jax.jit(update_fn)
    infer_j = jax.jit(infer_step)
    plan_j = jax.jit(plan)
    reset_j = jax.jit(penv.reset)
    step_j = jax.jit(penv.step)
    T = config.max_episode_length // config.action_repeat

    def collect(params, key, explore_noise):
        """Single-env rollout into the replay (reference
        collect_experience, train.py:179-195): appends the PRE-step
        observation with the action computed from it (`experience.append
        (obs, action, rwd, done); obs = next_obs`), so `planet.loss_fn`'s
        obs[1:] / actions[:-1] pairing sees the reference alignment.
        Exploration noise is `action_noise * U[0,1)` exactly like the
        reference's sample_action (`baselines.py:181-183` — uniform, not
        zero-mean)."""
        key, kr = jax.random.split(key)
        ps = reset_j(kr)
        h = jnp.zeros((1, cfg.belief_size))
        s = jnp.zeros((1, cfg.state_size))
        a = jnp.zeros((1, env.nu))
        total_r = 0.0
        for t in range(T):
            key, k1, k2, k3 = jax.random.split(key, 4)
            from ..render.raster import images_to_observation
            pre_pixels = ps.pixels      # obs the action is computed from
            obs_pl = images_to_observation(pre_pixels, config.bit_depth,
                                           key=k1)[None]
            h, s = infer_j(params, k2, h, s, a, obs_pl)
            a = plan_j(params, k3, h, s)
            if explore_noise > 0:
                key, kn = jax.random.split(key)
                a = jnp.clip(a + explore_noise * jax.random.uniform(
                    kn, a.shape), -1.0, 1.0)
            ps = step_j(ps, a[0])
            # Episode boundary: the reference's PlaNet env wrapper sets
            # done at max_episode_length (Kaixhin/PlaNet env.py; cloned
            # at reference Dockerfile:92), so the last step of the
            # fixed-length rollout is terminal — without it the replay's
            # nonterminals never mark a boundary for the three
            # non-terminating tasks and chunks would straddle resets.
            done = bool(ps.state.done) or (t == T - 1)
            mem.append(np.asarray(pre_pixels), np.asarray(a[0]),
                       float(ps.state.reward), done)
            total_r += float(ps.state.reward)
        return key, total_r

    # Seed episodes (reference :112-123).
    rng = np.random.default_rng(config.seed)
    t_seed = time.time()
    while mem.steps < max(config.batch_size, config.chunk_size) \
            or mem.episodes < config.seed_episodes:
        key, kr = jax.random.split(key)
        ps = reset_j(kr)
        for t in range(T):
            a = rng.uniform(-1, 1, env.nu).astype(np.float32)
            pre_pixels = np.asarray(ps.pixels)   # pre-step obs (see above)
            ps = step_j(ps, jnp.asarray(a))
            # Terminal at rollout end (see collect): hammer/door/relocate
            # never set done themselves, so without this the seed loop's
            # `mem.episodes < seed_episodes` condition NEVER becomes
            # false — an infinite loop (found when the smoke hung >1 h).
            mem.append(pre_pixels, a, float(ps.state.reward),
                       bool(ps.state.done) or t == T - 1)
    if PROF:
        print(f"planet: replay seeded ({mem.steps} steps, "
              f"{time.time() - t_seed:.0f}s incl. pixel-step compile)",
              flush=True)

    metrics = Metrics(tb_dir=out_dir)
    prof = ProfilerHook()
    for episode in range(config.seed_episodes + 1,
                         config.max_episodes + 1):
        prof.before(episode)
        for it in range(config.sample_iters):
            key, ku = jax.random.split(key)
            batch = {k: jnp.asarray(v) for k, v in
                     mem.sample(config.batch_size,
                                config.chunk_size).items()}
            params, opt_state, m = update_j(params, opt_state, ku, batch)
        key, total_r = collect(params, key, config.action_noise)
        prof.after(episode)
        metrics.append(episode=episode, reward=total_r,
                       **{k: float(v) for k, v in m.items()})
        if PROF:
            print(f"planet ep {episode}: reward {total_r:.1f} "
                  f"obs_loss {float(m['obs_loss']):.1f} "
                  f"kl {float(m['kl_loss']):.2f}", flush=True)
        if episode % config.checkpoint_interval == 0:
            CKPT.save(CKPT.checkpoint_path(out_dir, episode),
                      {"params": params, "opt_state": opt_state})
    metrics.save_csv(os.path.join(out_dir, "metrics.csv"))
    metrics.close()
    return params, metrics
