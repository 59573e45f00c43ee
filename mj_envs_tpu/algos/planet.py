"""PlaNet (RSSM world model + CEM planner) in JAX.

Re-creates the capability the reference imports from the Kaixhin/PlaNet
submodule (`baselines.py:15-17,199-326`; SURVEY.md §2.12):

* RSSM: deterministic belief h_t = GRU(h_{t-1}, mlp([s_{t-1}, a_{t-1}]));
  prior s_t ~ N(f(h_t)); posterior conditioned on the encoded observation
  (TransitionModel semantics, min_std 0.1).
* Conv encoder (4 conv layers to an `embedding_size` vector) and deconv
  observation decoder, reward MLP — the Kaixhin architectures.
* Training (`Planet.update`, baselines.py:268-302): observation + reward
  MSE plus max(KL, free_nats), Adam with grad clipping.
* Acting (`Planet.act`, :311-320): encode -> filter -> CEM plan
  (`MPCPlanner`: candidates=1000, top=100, iters=10, horizon=12,
  config.py:32-33,97-98) over the learned prior, first action returned;
  exploration noise added by the caller (train.py:189).

All pure functions over parameter pytrees: jit/vmap/pjit-friendly, no
framework modules in the hot path.
"""
from __future__ import annotations

from typing import Any, Dict, NamedTuple, Tuple

import numpy as np
import jax
import jax.numpy as jnp
import optax

from . import networks as N


class PlanetConfig(NamedTuple):
    belief_size: int = 200
    state_size: int = 30
    hidden_size: int = 200
    embedding_size: int = 1024
    action_size: int = 26
    min_std: float = 0.1
    free_nats: float = 3.0
    # planner (reference config.py:32-33,97-98)
    planning_horizon: int = 12
    optimisation_iters: int = 10
    candidates: int = 1000
    top_candidates: int = 100
    # training
    lr: float = 1e-3
    adam_eps: float = 1e-4
    grad_clip_norm: float = 1000.0


def cfg_from_config(config, action_size: int) -> "PlanetConfig":
    """Map a run `utils.config.PlanetConfig` (the reference-JSON-
    compatible attribute bag) to the algorithm NamedTuple — shared by
    the train loop and the eval/visualize CLIs so a checkpoint restores
    with the exact parameter shapes it was trained with."""
    return PlanetConfig(
        belief_size=config.belief_size, state_size=config.state_size,
        hidden_size=config.hidden_size,
        embedding_size=config.embedding_size,
        action_size=action_size, free_nats=float(config.free_nats),
        planning_horizon=config.planning_horizon,
        optimisation_iters=config.optimisation_iters,
        candidates=config.candidates,
        top_candidates=config.top_candidates,
        lr=config.learning_rate, adam_eps=config.adam_epsilon,
        grad_clip_norm=float(config.grad_clip_norm))


# ---------------------------------------------------------------------------
# parameter construction
# ---------------------------------------------------------------------------

def _linear(key, n_in, n_out, dtype=jnp.float32):
    k1, _ = jax.random.split(key)
    scale = jnp.sqrt(1.0 / n_in)
    return {"w": jax.random.uniform(k1, (n_in, n_out), dtype,
                                    -scale, scale),
            "b": jnp.zeros((n_out,), dtype)}


def _conv(key, cin, cout, k, dtype=jnp.float32):
    scale = jnp.sqrt(1.0 / (cin * k * k))
    return {"w": jax.random.uniform(key, (k, k, cin, cout), dtype,
                                    -scale, scale),
            "b": jnp.zeros((cout,), dtype)}


def init_params(key, cfg: PlanetConfig, dtype=jnp.float32) -> Dict:
    ks = jax.random.split(key, 24)
    B, S, H, E, A = (cfg.belief_size, cfg.state_size, cfg.hidden_size,
                     cfg.embedding_size, cfg.action_size)
    return {
        # transition (GRU + heads)
        "fc_embed_sa": _linear(ks[0], S + A, B, dtype),
        "gru": {
            "wz": _linear(ks[1], B + B, B, dtype),
            "wr": _linear(ks[2], B + B, B, dtype),
            "wh": _linear(ks[3], B + B, B, dtype),
        },
        "fc_prior1": _linear(ks[4], B, H, dtype),
        "fc_prior2": _linear(ks[5], H, 2 * S, dtype),
        "fc_post1": _linear(ks[6], B + E, H, dtype),
        "fc_post2": _linear(ks[7], H, 2 * S, dtype),
        # encoder: 64x64x3 -> E
        "enc": [_conv(ks[8], 3, 32, 4, dtype), _conv(ks[9], 32, 64, 4, dtype),
                _conv(ks[10], 64, 128, 4, dtype),
                _conv(ks[11], 128, 256, 4, dtype)],
        "enc_fc": _linear(ks[12], 1024, E, dtype),
        # decoder: (B+S) -> 64x64x3
        "dec_fc": _linear(ks[13], B + S, E, dtype),
        "dec": [_conv(ks[14], E, 128, 5, dtype),
                _conv(ks[15], 128, 64, 5, dtype),
                _conv(ks[16], 64, 32, 6, dtype),
                _conv(ks[17], 32, 3, 6, dtype)],
        # reward model
        "rew1": _linear(ks[18], B + S, H, dtype),
        "rew2": _linear(ks[19], H, H, dtype),
        "rew3": _linear(ks[20], H, 1, dtype),
    }


def _lin(p, x):
    return x @ p["w"] + p["b"]


def _gru(p, h, x):
    hx = jnp.concatenate([h, x], axis=-1)
    z = jax.nn.sigmoid(_lin(p["wz"], hx))
    r = jax.nn.sigmoid(_lin(p["wr"], hx))
    hh = jnp.tanh(_lin(p["wh"], jnp.concatenate([r * h, x], axis=-1)))
    return (1 - z) * h + z * hh


def encoder(params, obs):
    """obs (..., 64, 64, 3) in [-0.5, 0.5] -> (..., embedding_size)."""
    # Cast to the parameter dtype: under an x64-enabled host process the
    # rendered/replayed obs arrive f64 while conv weights are f32.
    x = obs.astype(params["enc"][0]["w"].dtype)
    batch_shape = x.shape[:-3]
    x = x.reshape((-1,) + x.shape[-3:])
    for c in params["enc"]:
        x = jax.lax.conv_general_dilated(
            x, c["w"], window_strides=(2, 2), padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC")) + c["b"]
        x = jax.nn.relu(x)
    x = x.reshape(x.shape[0], -1)                  # (N, 1024)
    x = _lin(params["enc_fc"], x)
    return x.reshape(batch_shape + (x.shape[-1],))


def decoder(params, belief, state):
    """(B+S) -> (..., 64, 64, 3) reconstruction mean."""
    hs = jnp.concatenate([belief, state], axis=-1)
    batch_shape = hs.shape[:-1]
    x = _lin(params["dec_fc"], hs).reshape(-1, 1, 1,
                                           params["dec_fc"]["w"].shape[1])
    for i, c in enumerate(params["dec"]):
        x = jax.lax.conv_transpose(
            x, c["w"], strides=(2, 2), padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC")) + c["b"]
        if i < len(params["dec"]) - 1:
            x = jax.nn.relu(x)
    return x.reshape(batch_shape + x.shape[1:])


def reward_model(params, belief, state):
    x = jnp.concatenate([belief, state], axis=-1)
    x = jax.nn.relu(_lin(params["rew1"], x))
    x = jax.nn.relu(_lin(params["rew2"], x))
    return _lin(params["rew3"], x)[..., 0]


def _split_stats(x, min_std):
    mean, std_raw = jnp.split(x, 2, axis=-1)
    std = jax.nn.softplus(std_raw) + min_std
    return mean, std


def transition_step(params, cfg: PlanetConfig, h, s, a):
    """One RSSM deterministic + prior step."""
    x = jax.nn.relu(_lin(params["fc_embed_sa"],
                         jnp.concatenate([s, a], axis=-1)))
    h_new = _gru(params["gru"], h, x)
    prior = _split_stats(
        _lin(params["fc_prior2"],
             jax.nn.relu(_lin(params["fc_prior1"], h_new))), cfg.min_std)
    return h_new, prior


def posterior_stats(params, cfg: PlanetConfig, h, embed):
    return _split_stats(
        _lin(params["fc_post2"],
             jax.nn.relu(_lin(params["fc_post1"],
                              jnp.concatenate([h, embed], axis=-1)))),
        cfg.min_std)


# ---------------------------------------------------------------------------
# training
# ---------------------------------------------------------------------------

def rollout_posterior(params, cfg, key, h0, s0, actions, embeds,
                      nonterminals):
    """Filter a (T, batch, ...) sequence; returns beliefs, posterior
    samples and the prior/posterior stats for the KL."""
    def step(carry, inp):
        h, s, k = carry
        a, e, nt = inp
        k, ks = jax.random.split(k)
        h, (pm, ps) = transition_step(params, cfg, h, s * nt[:, None], a)
        qm, qs = posterior_stats(params, cfg, h, e)
        s_new = qm + qs * jax.random.normal(ks, qm.shape, qm.dtype)
        return (h, s_new, k), (h, s_new, pm, ps, qm, qs)

    (_, _, _), outs = jax.lax.scan(
        step, (h0, s0, key), (actions, embeds, nonterminals))
    return outs


def make_planet(cfg: PlanetConfig):
    tx = optax.chain(optax.clip_by_global_norm(cfg.grad_clip_norm),
                     optax.adam(cfg.lr, eps=cfg.adam_eps))

    def init_fn(key):
        params = init_params(key, cfg)
        return params, tx.init(params)

    def loss_fn(params, key, obs, actions, rewards, nonterminals):
        """obs (T, B, 64, 64, 3) in [-0.5, 0.5]; actions/rewards (T, B).
        The reference uses obs[1:] against beliefs from actions[:-1]
        (baselines.py:275-287)."""
        T, Bt = actions.shape[:2]
        h0 = jnp.zeros((Bt, cfg.belief_size), obs.dtype)
        s0 = jnp.zeros((Bt, cfg.state_size), obs.dtype)
        embeds = encoder(params, obs[1:])
        h, s, pm, ps, qm, qs = rollout_posterior(
            params, cfg, key, h0, s0, actions[:-1], embeds,
            nonterminals[:-1])
        recon = decoder(params, h, s)
        obs_loss = jnp.mean(jnp.sum(
            (recon - obs[1:]) ** 2, axis=(-1, -2, -3)))
        rew_pred = reward_model(params, h, s)
        rew_loss = jnp.mean((rew_pred - rewards[:-1]) ** 2)
        kl = jnp.sum(
            jnp.log(ps) - jnp.log(qs)
            + (qs ** 2 + (qm - pm) ** 2) / (2 * ps ** 2) - 0.5, axis=-1)
        kl_loss = jnp.mean(jnp.maximum(kl, cfg.free_nats))
        total = obs_loss + rew_loss + kl_loss
        return total, dict(obs_loss=obs_loss, rew_loss=rew_loss,
                           kl_loss=kl_loss)

    def update_fn(params, opt_state, key, batch):
        # Batches may arrive f64 from an x64-enabled host (replay stores
        # numpy); the model trains in the parameter dtype.
        pdt = jax.tree_util.tree_leaves(params)[0].dtype
        batch = {k: jnp.asarray(v, pdt) for k, v in batch.items()}
        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, key, batch["obs"], batch["actions"],
            batch["rewards"], batch["nonterminals"])
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, metrics

    def infer_step(params, key, h, s, action, obs):
        """Filter step for acting: advance belief with the last action,
        condition on the new observation (baselines.py:311-317)."""
        h, _ = transition_step(params, cfg, h, s, action)
        embed = encoder(params, obs)
        qm, qs = posterior_stats(params, cfg, h, embed)
        s = qm + qs * jax.random.normal(key, qm.shape, qm.dtype)
        return h, s

    def plan(params, key, h, s):
        """CEM over the learned prior (MPCPlanner semantics: iterative
        refit of a diagonal Gaussian over action sequences, mean of the
        top-K by predicted reward; first action returned)."""
        A = cfg.action_size
        Hz = cfg.planning_horizon
        Bt = h.shape[0]

        def cem_iter(carry, _):
            mean, std, k = carry           # (Hz, Bt, A)
            k, ks, kr = jax.random.split(k, 3)
            eps = jax.random.normal(
                ks, (cfg.candidates, Hz, Bt, A), mean.dtype)
            acts = jnp.clip(mean[None] + std[None] * eps, -1.0, 1.0)

            def rollout_return(a_seq):
                def tstep(carry, a):
                    hh, ss = carry
                    hh, (pm, pstd) = transition_step(params, cfg, hh, ss, a)
                    ss = pm                # mean prior rollout
                    r = reward_model(params, hh, ss)
                    return (hh, ss), r
                (_, _), rs = jax.lax.scan(tstep, (h, s), a_seq)
                return rs.sum(axis=0)      # (Bt,)

            returns = jax.vmap(rollout_return)(acts)   # (cand, Bt)
            _, top = jax.lax.top_k(returns.T, cfg.top_candidates)
            best = jnp.take_along_axis(
                acts.transpose(2, 0, 1, 3),            # (Bt, cand, Hz, A)
                top[:, :, None, None], axis=1)         # (Bt, topk, Hz, A)
            mean = best.mean(axis=1).transpose(1, 0, 2)
            std = best.std(axis=1).transpose(1, 0, 2) + 1e-6
            return (mean, std, k), None

        mean0 = jnp.zeros((Hz, Bt, A), h.dtype)
        std0 = jnp.ones((Hz, Bt, A), h.dtype)
        (mean, _, _), _ = jax.lax.scan(
            cem_iter, (mean0, std0, key), None,
            length=cfg.optimisation_iters)
        return mean[0]                     # first planned action (Bt, A)

    return init_fn, update_fn, infer_step, plan
