"""Soft Actor-Critic in JAX — the off-policy learner of BASELINE
config #4 ("multi-host sharded rollout feeding NPG/SAC learner").

The reference has no SAC (its zoo is DAPG/PPO/PlaNet,
`mj_envs_vision/algos/baselines.py:28`); this is a forward-looking
member of the policy zoo in the same TPU-native mold: tanh-squashed
Gaussian actor, twin Q critics with polyak targets, automatic
temperature tuning to -|A| target entropy, an on-device fixed-capacity
replay ring (pure pytree state, donate-friendly), and a single jitted
`train_iter` = N env steps + M gradient steps, shardable over the env
mesh like `algos/ppo.py`.
"""
from __future__ import annotations

from typing import Any, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax

from . import networks as N
from ..envs.base import AdroitEnv, EnvState


class SACConfig(NamedTuple):
    lr: float = 3e-4
    gamma: float = 0.99
    tau: float = 0.005            # polyak
    hidden: Tuple[int, ...] = (256, 256)
    buffer_size: int = 100_000    # transitions (across all envs)
    batch_size: int = 256
    steps_per_iter: int = 16      # env steps per train_iter (per env)
    updates_per_iter: int = 16
    warmup_steps: int = 1_000     # random actions until this many stored
    log_std_min: float = -20.0
    log_std_max: float = 2.0


class Replay(NamedTuple):
    """On-device ring buffer of transitions."""
    obs: jnp.ndarray       # (cap, obs_dim)
    action: jnp.ndarray    # (cap, act_dim)
    reward: jnp.ndarray    # (cap,)
    next_obs: jnp.ndarray  # (cap, obs_dim)
    done: jnp.ndarray      # (cap,)
    idx: jnp.ndarray       # () int32 write head
    size: jnp.ndarray      # () int32 valid entries


class SACState(NamedTuple):
    actor: Any
    critic: Any            # {"q1": mlp, "q2": mlp}
    target_critic: Any
    log_alpha: jnp.ndarray
    opt_actor: Any
    opt_critic: Any
    opt_alpha: Any
    replay: Replay
    env_steps: jnp.ndarray  # () int32
    key: jax.Array


def _actor_init(key, obs_dim, act_dim, hidden):
    return N.mlp_init(key, (obs_dim, *hidden, 2 * act_dim), 0.01)


def _actor_dist(actor, obs, act_dim, cfg: SACConfig):
    out = N.mlp_apply(actor, obs, activation=jax.nn.relu)
    mean, log_std = out[..., :act_dim], out[..., act_dim:]
    log_std = jnp.clip(log_std, cfg.log_std_min, cfg.log_std_max)
    return mean, log_std


def _sample_tanh(key, mean, log_std):
    """Reparameterized tanh-Gaussian sample + log-prob."""
    std = jnp.exp(log_std)
    z = mean + std * jax.random.normal(key, mean.shape, mean.dtype)
    a = jnp.tanh(z)
    logp = jnp.sum(
        -0.5 * ((z - mean) / std) ** 2 - log_std
        - 0.5 * jnp.log(2 * jnp.pi)
        - jnp.log(jnp.clip(1 - a ** 2, 1e-6)), axis=-1)
    return a, logp


def _q_apply(critic, obs, act):
    x = jnp.concatenate([obs, act], axis=-1)
    q1 = N.mlp_apply(critic["q1"], x, activation=jax.nn.relu)[..., 0]
    q2 = N.mlp_apply(critic["q2"], x, activation=jax.nn.relu)[..., 0]
    return q1, q2


def make_sac(env: AdroitEnv, num_envs: int, cfg: SACConfig = SACConfig()):
    """Build (init_fn, train_iter_fn, act_fn)."""
    obs_dim, act_dim = env.OBS_DIM, env.nu
    target_entropy = -float(act_dim)
    tx = optax.adam(cfg.lr)
    from ..parallel.vector import chunked_vmap
    # Chunked stepping: holds per-env solver cost flat at large fleets
    # (see parallel/vector.chunked_vmap).
    v_step = chunked_vmap(env.step_auto_reset, 512)

    def init_fn(key) -> SACState:
        ka, k1, k2, kt = jax.random.split(key, 4)
        actor = _actor_init(ka, obs_dim, act_dim, cfg.hidden)
        critic = {
            "q1": N.mlp_init(k1, (obs_dim + act_dim, *cfg.hidden, 1), 1.0),
            "q2": N.mlp_init(k2, (obs_dim + act_dim, *cfg.hidden, 1), 1.0),
        }
        log_alpha = jnp.zeros(())
        cap = cfg.buffer_size
        replay = Replay(
            obs=jnp.zeros((cap, obs_dim)),
            action=jnp.zeros((cap, act_dim)),
            reward=jnp.zeros((cap,)),
            next_obs=jnp.zeros((cap, obs_dim)),
            done=jnp.zeros((cap,), bool),
            idx=jnp.zeros((), jnp.int32),
            size=jnp.zeros((), jnp.int32))
        return SACState(
            actor=actor, critic=critic, target_critic=critic,
            log_alpha=log_alpha, opt_actor=tx.init(actor),
            opt_critic=tx.init(critic), opt_alpha=tx.init(log_alpha),
            replay=replay, env_steps=jnp.zeros((), jnp.int32), key=kt)

    def act_fn(actor, obs, key):
        mean, log_std = _actor_dist(actor, obs, act_dim, cfg)
        a, _ = _sample_tanh(key, mean, log_std)
        return a

    def _store(replay: Replay, batch) -> Replay:
        """Append a (B,) batch of transitions at the ring head."""
        B = batch["obs"].shape[0]
        cap = replay.obs.shape[0]
        at = (replay.idx + jnp.arange(B)) % cap

        return Replay(
            obs=replay.obs.at[at].set(batch["obs"]),
            action=replay.action.at[at].set(batch["action"]),
            reward=replay.reward.at[at].set(batch["reward"]),
            next_obs=replay.next_obs.at[at].set(batch["next_obs"]),
            done=replay.done.at[at].set(batch["done"]),
            idx=(replay.idx + B) % cap,
            size=jnp.minimum(replay.size + B, cap))

    def _update_once(state: SACState, key):
        ks, ka, kn = jax.random.split(key, 3)
        sel = jax.random.randint(ks, (cfg.batch_size,), 0,
                                 jnp.maximum(state.replay.size, 1))
        obs = state.replay.obs[sel]
        act = state.replay.action[sel]
        rew = state.replay.reward[sel]
        nobs = state.replay.next_obs[sel]
        done = state.replay.done[sel].astype(jnp.float32)
        alpha = jnp.exp(state.log_alpha)

        # Critic update.
        mean_n, ls_n = _actor_dist(state.actor, nobs, act_dim, cfg)
        a_n, logp_n = _sample_tanh(kn, mean_n, ls_n)
        q1_t, q2_t = _q_apply(state.target_critic, nobs, a_n)
        target = rew + cfg.gamma * (1 - done) * (
            jnp.minimum(q1_t, q2_t) - alpha * logp_n)
        target = jax.lax.stop_gradient(target)

        def critic_loss(critic):
            q1, q2 = _q_apply(critic, obs, act)
            return jnp.mean((q1 - target) ** 2 + (q2 - target) ** 2)

        cl, gc = jax.value_and_grad(critic_loss)(state.critic)
        up_c, opt_critic = tx.update(gc, state.opt_critic, state.critic)
        critic = optax.apply_updates(state.critic, up_c)

        # Actor update.
        def actor_loss(actor):
            mean, ls = _actor_dist(actor, obs, act_dim, cfg)
            a, logp = _sample_tanh(ka, mean, ls)
            q1, q2 = _q_apply(critic, obs, a)
            return jnp.mean(alpha * logp - jnp.minimum(q1, q2)), logp

        (al, logp), ga = jax.value_and_grad(
            actor_loss, has_aux=True)(state.actor)
        up_a, opt_actor = tx.update(ga, state.opt_actor, state.actor)
        actor = optax.apply_updates(state.actor, up_a)

        # Temperature update.
        def alpha_loss(log_alpha):
            return -jnp.mean(jnp.exp(log_alpha)
                             * (jax.lax.stop_gradient(logp)
                                + target_entropy))

        tl, gt = jax.value_and_grad(alpha_loss)(state.log_alpha)
        up_t, opt_alpha = tx.update(gt, state.opt_alpha, state.log_alpha)
        log_alpha = optax.apply_updates(state.log_alpha, up_t)

        target_critic = jax.tree_util.tree_map(
            lambda t, o: (1 - cfg.tau) * t + cfg.tau * o,
            state.target_critic, critic)
        state = state._replace(
            actor=actor, critic=critic, target_critic=target_critic,
            log_alpha=log_alpha, opt_actor=opt_actor,
            opt_critic=opt_critic, opt_alpha=opt_alpha)
        return state, dict(critic_loss=cl, actor_loss=al,
                           alpha=jnp.exp(log_alpha))

    def train_iter_fn(state: SACState, env_state: EnvState):
        key, kr = jax.random.split(state.key)

        # --- collect steps_per_iter steps from all envs ---------------
        def collect(carry, _):
            es, replay, steps, k = carry
            k, ka, kw = jax.random.split(k, 3)
            a_pol = act_fn(state.actor, es.obs, ka)
            a_rand = jax.random.uniform(
                kw, (num_envs, act_dim), minval=-1.0, maxval=1.0)
            warm = steps < cfg.warmup_steps
            a = jnp.where(warm, a_rand, a_pol)
            es2 = v_step(es, a)
            # Truncation handling (SB3 TimeLimit semantics): at a pure
            # truncation the stored next_obs must be the FINISHING obs
            # (es2.obs is already the next episode's) and done must stay
            # 0 so the Q-target keeps bootstrapping; at termination /
            # quarantine done=1 masks next_obs anyway.
            next_obs = jnp.where(es2.truncated[:, None],
                                 es2.final_obs, es2.obs)
            replay = _store(replay, dict(
                obs=es.obs, action=a, reward=es2.reward,
                next_obs=next_obs, done=es2.done & ~es2.truncated))
            return (es2, replay, steps + num_envs, k), es2.reward.mean()

        (env_state, replay, env_steps, key), rews = jax.lax.scan(
            collect, (env_state, state.replay, state.env_steps, key),
            None, length=cfg.steps_per_iter)
        state = state._replace(replay=replay, env_steps=env_steps)

        # --- gradient updates -----------------------------------------
        def upd(st, k):
            return _update_once(st, k)

        keys = jax.random.split(key, cfg.updates_per_iter + 1)
        key, upd_keys = keys[0], keys[1:]

        def do_updates(st):
            st2, metrics = jax.lax.scan(upd, st, upd_keys)
            return st2, jax.tree_util.tree_map(lambda x: x.mean(), metrics)

        def skip_updates(st):
            return st, dict(critic_loss=jnp.zeros(()),
                            actor_loss=jnp.zeros(()),
                            alpha=jnp.exp(st.log_alpha))

        state, metrics = jax.lax.cond(
            state.replay.size >= cfg.batch_size, do_updates, skip_updates,
            state)
        state = state._replace(key=key)
        metrics["mean_reward"] = rews.mean()
        metrics["replay_size"] = state.replay.size
        metrics["nan_resets"] = env_state.nan_resets.sum()
        return state, env_state, metrics

    return init_fn, train_iter_fn, act_fn
