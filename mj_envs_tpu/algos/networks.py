"""Policy / value networks.

The reference's policy zoo (`mj_envs_vision/algos/baselines.py`) spans an
mjrl Gaussian MLP (hidden (32,32), `MLPBaseline:43-86`), SB3
ActorCriticPolicy MLPs (64,64 tanh), and PlaNet's RSSM stack.  These are
re-created as plain JAX pytree modules — no framework classes in the hot
path, everything is jit/vmap/pjit-friendly.
"""
from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp


def _init_linear(key, fan_in, fan_out, scale=jnp.sqrt(2.0), dtype=jnp.float32):
    """Orthogonal init (SB3 default for ActorCriticPolicy)."""
    w = jax.random.orthogonal(key, max(fan_in, fan_out), dtype=dtype)
    w = w[:fan_in, :fan_out] * scale
    return {"w": w, "b": jnp.zeros((fan_out,), dtype)}


def mlp_init(key, sizes: Sequence[int], out_scale=0.01, dtype=jnp.float32):
    """MLP params: sizes = (in, h1, ..., out)."""
    keys = jax.random.split(key, len(sizes) - 1)
    layers = []
    for i, k in enumerate(keys):
        scale = out_scale if i == len(keys) - 1 else jnp.sqrt(2.0)
        layers.append(_init_linear(k, sizes[i], sizes[i + 1], scale, dtype))
    return layers


def mlp_apply(layers, x, activation=jnp.tanh):
    for lyr in layers[:-1]:
        x = activation(x @ lyr["w"] + lyr["b"])
    last = layers[-1]
    return x @ last["w"] + last["b"]


def actor_critic_init(key, obs_dim: int, act_dim: int,
                      hidden: Sequence[int] = (64, 64), dtype=jnp.float32):
    """Diagonal-Gaussian actor + value critic (SB3 ActorCriticPolicy
    layout: separate trunks, state-independent log_std)."""
    ka, kc = jax.random.split(key)
    return {
        "actor": mlp_init(ka, (obs_dim, *hidden, act_dim), 0.01, dtype),
        "critic": mlp_init(kc, (obs_dim, *hidden, 1), 1.0, dtype),
        "log_std": jnp.zeros((act_dim,), dtype),
    }


def actor_critic_apply(params, obs) -> Tuple[jnp.ndarray, jnp.ndarray,
                                             jnp.ndarray]:
    """-> (mean, log_std, value)."""
    mean = mlp_apply(params["actor"], obs)
    value = mlp_apply(params["critic"], obs)[..., 0]
    return mean, params["log_std"], value


def gaussian_log_prob(mean, log_std, action):
    std = jnp.exp(log_std)
    z = (action - mean) / std
    return jnp.sum(-0.5 * z * z - log_std - 0.5 * jnp.log(2 * jnp.pi),
                   axis=-1)


def gaussian_entropy(log_std):
    return jnp.sum(log_std + 0.5 * jnp.log(2 * jnp.pi * jnp.e), axis=-1)


def gaussian_sample(key, mean, log_std):
    return mean + jnp.exp(log_std) * jax.random.normal(
        key, mean.shape, mean.dtype)
