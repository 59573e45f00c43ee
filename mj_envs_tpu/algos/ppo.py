"""PPO in JAX — the TPU-native counterpart of the reference's SB3 wrapper
(`mj_envs_vision/algos/baselines.py:106-183`: clipped-surrogate PPO with
ActorCriticPolicy, `update()` = learn(n_steps), metrics scraped from the
SB3 logger `:169-175`).

Differences by design (not omissions): rollouts are collected on-device
from thousands of vectorized envs (the reference steps ONE env on CPU);
the whole iteration (rollout scan + GAE + minibatch epochs) is a single
jitted function; gradients are averaged across the mesh automatically by
XLA when params are replicated and data is env-sharded.
"""
from __future__ import annotations

from typing import Any, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax

from . import networks as N
from ..envs.base import AdroitEnv, EnvState


class PPOConfig(NamedTuple):
    lr: float = 3e-4
    n_steps: int = 64            # rollout length per iteration
    n_minibatches: int = 8
    n_epochs: int = 4
    gamma: float = 0.99
    gae_lambda: float = 0.95
    clip_eps: float = 0.2
    vf_coef: float = 0.5
    ent_coef: float = 0.0
    max_grad_norm: float = 0.5
    hidden: Tuple[int, ...] = (64, 64)
    # Step the env batch in sequential chunks (parallel/vector
    # .chunked_vmap): the Newton while_loop's early exit is batch-wide,
    # so large fleets pay the slowest env's iterations — chunking holds
    # per-env cost flat (+37% at 4096 envs on v5e).  <=chunk batches
    # use plain vmap.  0 disables.
    step_chunk: int = 512
    # Pixel path: the ray-caster materializes (B, G, H, W, 3) per-group
    # intermediates (~16 GB at B=1024 unchunked) — render/step in
    # chunks of this many envs.
    pixel_chunk: int = 256


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    key: jax.Array


class Transition(NamedTuple):
    obs: jnp.ndarray
    action: jnp.ndarray
    log_prob: jnp.ndarray
    value: jnp.ndarray
    reward: jnp.ndarray
    done: jnp.ndarray
    trunc_boot: jnp.ndarray   # V(final_obs) at pure truncations, else 0


def make_ppo(env: AdroitEnv, num_envs: int, cfg: PPOConfig = PPOConfig()):
    """Build (init_fn, train_iter_fn, act_fn) closures for `env`.

    train_iter_fn(train_state, env_state) -> (train_state, env_state,
    metrics): one full PPO iteration (rollout + update), jittable and
    shardable (env axis on env_state, replicated params)."""
    from ..parallel.vector import chunked_vmap
    tx = optax.chain(
        optax.clip_by_global_norm(cfg.max_grad_norm),
        optax.adam(cfg.lr))
    v_step = chunked_vmap(env.step_auto_reset, cfg.step_chunk)

    def init_fn(key: jax.Array) -> TrainState:
        kp, kt = jax.random.split(key)
        params = N.actor_critic_init(kp, env.OBS_DIM, env.nu, cfg.hidden)
        return TrainState(params=params, opt_state=tx.init(params), key=kt)

    def act_fn(params, obs, key):
        mean, log_std, value = N.actor_critic_apply(params, obs)
        action = N.gaussian_sample(key, mean, log_std)
        return action, N.gaussian_log_prob(mean, log_std, action), value

    def rollout(params, env_state: EnvState, key):
        def step_fn(carry, _):
            es, k = carry
            k, ka = jax.random.split(k)
            action, logp, value = act_fn(params, es.obs, ka)
            es2 = v_step(es, jnp.clip(action, -1.0, 1.0))
            # Truncation bootstrap (reference SB3 PPO semantics: at a
            # TimeLimit boundary the return target bootstraps
            # V(terminal_observation), not 0 — the episode didn't end by
            # the task's rules).  es2.obs is already the NEXT episode's
            # obs there, so the finishing obs comes from final_obs.
            v_final = N.actor_critic_apply(params, es2.final_obs)[2]
            trunc_boot = jnp.where(es2.truncated, v_final, 0.0)
            tr = Transition(obs=es.obs, action=action, log_prob=logp,
                            value=value, reward=es2.reward, done=es2.done,
                            trunc_boot=trunc_boot)
            return (es2, k), tr

        (env_state, _), traj = jax.lax.scan(
            step_fn, (env_state, key), None, length=cfg.n_steps)
        return env_state, traj

    update = _make_update(cfg, tx, N.actor_critic_apply)

    def train_iter_fn(train_state: TrainState, env_state: EnvState):
        key, kr = jax.random.split(train_state.key)
        train_state = train_state._replace(key=key)
        env_state, traj = rollout(train_state.params, env_state, kr)
        _, _, last_value = N.actor_critic_apply(train_state.params,
                                                env_state.obs)
        advs, rets = _gae(cfg, traj, last_value)
        train_state, metrics = update(train_state, traj, advs, rets)
        metrics["mean_reward"] = traj.reward.mean()
        metrics["mean_episode_done"] = traj.done.astype(jnp.float32).mean()
        # Cumulative quarantined non-finite states across the env batch
        # (in-graph fault detection; see AdroitEnv.step_auto_reset).
        metrics["nan_resets"] = env_state.nan_resets.sum()
        return train_state, env_state, metrics

    return init_fn, train_iter_fn, act_fn


def _gae(cfg: PPOConfig, traj: Transition, last_value):
    """Generalized advantage estimation over a (T, B) trajectory."""
    def scan_fn(carry, tr):
        adv_next, v_next = carry
        nonterm = 1.0 - tr.done.astype(tr.value.dtype)
        # boundary value: 0 at termination/quarantine,
        # V(final_obs) at pure truncation, V(next obs) mid-episode
        boot = v_next * nonterm + tr.trunc_boot
        delta = tr.reward + cfg.gamma * boot - tr.value
        adv = delta + cfg.gamma * cfg.gae_lambda * nonterm * adv_next
        return (adv, tr.value), adv

    (_, _), advs = jax.lax.scan(
        scan_fn, (jnp.zeros_like(last_value), last_value), traj,
        reverse=True)
    return advs, advs + traj.value


def _make_update(cfg: PPOConfig, tx, apply_fn):
    """Minibatch-epoch PPO update closure over `apply_fn(params, obs) ->
    (mean, log_std, value)` — shared by the state-vector and pixel
    policies (obs may be any (..., *obs_shape) array, incl. uint8
    pixels: the CNN torso rescales in-graph)."""

    def loss_fn(params, batch, adv, ret):
        mean, log_std, value = apply_fn(params, batch.obs)
        logp = N.gaussian_log_prob(mean, log_std, batch.action)
        ratio = jnp.exp(logp - batch.log_prob)
        adv_n = (adv - adv.mean()) / (adv.std() + 1e-8)
        pg1 = ratio * adv_n
        pg2 = jnp.clip(ratio, 1 - cfg.clip_eps, 1 + cfg.clip_eps) * adv_n
        pg_loss = -jnp.mean(jnp.minimum(pg1, pg2))
        v_loss = 0.5 * jnp.mean((value - ret) ** 2)
        ent = jnp.mean(N.gaussian_entropy(log_std))
        total = pg_loss + cfg.vf_coef * v_loss - cfg.ent_coef * ent
        clip_frac = jnp.mean(
            (jnp.abs(ratio - 1.0) > cfg.clip_eps).astype(jnp.float32))
        approx_kl = jnp.mean(batch.log_prob - logp)
        return total, dict(pg_loss=pg_loss, v_loss=v_loss, entropy=ent,
                           clip_fraction=clip_frac, approx_kl=approx_kl)

    def update(train_state: TrainState, traj: Transition, advs, rets):
        T, B = traj.reward.shape
        flat = jax.tree_util.tree_map(
            lambda x: x.reshape(T * B, *x.shape[2:]), traj)
        advs = advs.reshape(T * B)
        rets = rets.reshape(T * B)
        mb = (T * B) // cfg.n_minibatches

        def epoch(carry, _):
            params, opt_state, key = carry
            key, kp = jax.random.split(key)
            perm = jax.random.permutation(kp, T * B)

            def minibatch(carry, idx):
                params, opt_state = carry
                sel = jax.lax.dynamic_slice_in_dim(perm, idx * mb, mb)
                batch = jax.tree_util.tree_map(lambda x: x[sel], flat)
                (_, metrics), grads = jax.value_and_grad(
                    loss_fn, has_aux=True)(params, batch, advs[sel],
                                           rets[sel])
                updates, opt_state = tx.update(grads, opt_state, params)
                params = optax.apply_updates(params, updates)
                return (params, opt_state), metrics

            (params, opt_state), metrics = jax.lax.scan(
                minibatch, (params, opt_state),
                jnp.arange(cfg.n_minibatches))
            return (params, opt_state, key), metrics

        (params, opt_state, key), metrics = jax.lax.scan(
            epoch, (train_state.params, train_state.opt_state,
                    train_state.key), None, length=cfg.n_epochs)
        metrics = jax.tree_util.tree_map(lambda x: x.mean(), metrics)
        return TrainState(params, opt_state, key), metrics

    return update


def make_pixel_ppo(penv, num_envs: int, cfg: PPOConfig = PPOConfig()):
    """PPO on 64x64 pixel observations with the CNN actor-critic — the
    reference's `config.model_type == "cnn"` family
    (`mj_envs_vision/algos/baselines.py:120-134`:
    `ActorCriticCnnPolicy` over `CustomPixelObservationWrapper` pixels).

    `penv` is an `envs.pixels.PixelObservationEnv`; rollouts render
    on-device and store frames as uint8 (a (T, B, 64, 64, 3) f32 buffer
    would be ~0.8 GB at T=64, B=256 — uint8 matches the reference's GL
    frames and quarters HBM).  At a truncation boundary the finishing
    frame is rendered and valued only when some env actually truncated
    (`lax.cond` on the batch-level predicate: episodes truncate in
    lockstep for the three never-terminating tasks, so the second render
    runs on boundary steps only)."""
    from ..envs.pixels import PixelEnvState

    from ..parallel.vector import chunked_vmap
    tx = optax.chain(
        optax.clip_by_global_norm(cfg.max_grad_norm),
        optax.adam(cfg.lr))
    env = penv.env
    v_pair = chunked_vmap(env._step_auto_reset_pair, cfg.pixel_chunk)
    v_render = chunked_vmap(penv._render, cfg.pixel_chunk)

    def init_fn(key: jax.Array) -> TrainState:
        kp, kt = jax.random.split(key)
        params = N.cnn_actor_critic_init(kp, env.nu, in_hw=penv.height)
        return TrainState(params=params, opt_state=tx.init(params), key=kt)

    def act_fn(params, pixels, key):
        mean, log_std, value = N.cnn_actor_critic_apply(params, pixels)
        action = N.gaussian_sample(key, mean, log_std)
        return action, N.gaussian_log_prob(mean, log_std, action), value

    def rollout(params, pstate: "PixelEnvState", key):
        def step_fn(carry, _):
            ps, k = carry
            k, ka = jax.random.split(k)
            action, logp, value = act_fn(params, ps.pixels, ka)
            merged, raw = v_pair(ps.state, jnp.clip(action, -1.0, 1.0))
            pixels = v_render(merged)     # next policy input (fresh on
            #                               restart — auto-reset semantics)

            def boot(_):
                return N.cnn_actor_critic_apply(params, v_render(raw))[2]

            v_final = jax.lax.cond(jnp.any(merged.truncated), boot,
                                   lambda _: jnp.zeros_like(value), None)
            trunc_boot = jnp.where(merged.truncated, v_final, 0.0)
            tr = Transition(
                obs=jnp.round(ps.pixels).astype(jnp.uint8), action=action,
                log_prob=logp, value=value, reward=merged.reward,
                done=merged.done, trunc_boot=trunc_boot)
            return (PixelEnvState(state=merged, pixels=pixels), k), tr

        (pstate, _), traj = jax.lax.scan(
            step_fn, (pstate, key), None, length=cfg.n_steps)
        return pstate, traj

    update = _make_update(cfg, tx, N.cnn_actor_critic_apply)

    def train_iter_fn(train_state: TrainState, pstate):
        key, kr = jax.random.split(train_state.key)
        train_state = train_state._replace(key=key)
        pstate, traj = rollout(train_state.params, pstate, kr)
        last_value = N.cnn_actor_critic_apply(train_state.params,
                                              pstate.pixels)[2]
        advs, rets = _gae(cfg, traj, last_value)
        train_state, metrics = update(train_state, traj, advs, rets)
        metrics["mean_reward"] = traj.reward.mean()
        metrics["mean_episode_done"] = traj.done.astype(jnp.float32).mean()
        metrics["nan_resets"] = pstate.state.nan_resets.sum()
        return train_state, pstate, metrics

    return init_fn, train_iter_fn, act_fn
