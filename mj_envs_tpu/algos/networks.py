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


# ---------------------------------------------------------------------------
# CNN actor-critic for pixel observations — counterpart of the reference's
# `ActorCriticCnnPolicy` path (`mj_envs_vision/algos/baselines.py:120-134`:
# SB3 selects the CNN policy when `config.model_type == "cnn"`).  Torso is
# SB3's NatureCNN (conv 32x8x8/4, 64x4x4/2, 64x3x3/1, fc 512, ReLU),
# shared by the actor and critic heads exactly like SB3's default
# share_features_extractor=True.  TPU notes: convs are NHWC (XLA maps
# them onto the MXU), inputs stay [0, 255] f32 and are scaled in-graph.
# ---------------------------------------------------------------------------


def _init_conv(key, kh, kw, cin, cout, scale=jnp.sqrt(2.0),
               dtype=jnp.float32):
    fan_in = kh * kw * cin
    w = jax.random.orthogonal(key, max(fan_in, cout), dtype=dtype)
    w = (w[:fan_in, :cout] * scale).reshape(kh, kw, cin, cout)
    return {"w": w, "b": jnp.zeros((cout,), dtype)}


_NATURE_CONVS = ((8, 4, 32), (4, 2, 64), (3, 1, 64))  # (kernel, stride, out)


def cnn_torso_init(key, in_hw: int = 64, in_ch: int = 3, feat: int = 512,
                   dtype=jnp.float32):
    keys = jax.random.split(key, len(_NATURE_CONVS) + 1)
    convs, c, hw = [], in_ch, in_hw
    for k, (ksz, stride, cout) in zip(keys, _NATURE_CONVS):
        convs.append(_init_conv(k, ksz, ksz, c, cout, dtype=dtype))
        hw = (hw - ksz) // stride + 1       # VALID padding (SB3 NatureCNN)
        c = cout
    flat = hw * hw * c
    return {"convs": convs,
            "fc": _init_linear(keys[-1], flat, feat, jnp.sqrt(2.0), dtype)}


def cnn_torso_apply(torso, pixels):
    """pixels (..., H, W, 3) in [0, 255] (f32 or uint8) -> (..., feat).
    Cast to the parameter dtype first: under an x64-enabled host process
    uint8/255.0 would promote to f64 and conv would reject the mixed
    dtypes (same guard as planet.encoder)."""
    lead = pixels.shape[:-3]
    dtype = torso["fc"]["w"].dtype
    x = pixels.reshape((-1,) + pixels.shape[-3:]).astype(dtype) / 255.0
    for lyr, (_, stride, _) in zip(torso["convs"], _NATURE_CONVS):
        x = jax.lax.conv_general_dilated(
            x, lyr["w"], window_strides=(stride, stride), padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        x = jax.nn.relu(x + lyr["b"])
    x = x.reshape(x.shape[0], -1)
    x = jax.nn.relu(x @ torso["fc"]["w"] + torso["fc"]["b"])
    return x.reshape(lead + (x.shape[-1],))


def cnn_actor_critic_init(key, act_dim: int, in_hw: int = 64,
                          in_ch: int = 3, feat: int = 512,
                          dtype=jnp.float32):
    """Shared-CNN-torso diagonal-Gaussian actor + value critic (the SB3
    ActorCriticCnnPolicy layout: one features extractor, small linear
    heads, state-independent log_std)."""
    kt, ka, kc = jax.random.split(key, 3)
    return {
        "torso": cnn_torso_init(kt, in_hw, in_ch, feat, dtype),
        "actor": mlp_init(ka, (feat, act_dim), 0.01, dtype),
        "critic": mlp_init(kc, (feat, 1), 1.0, dtype),
        "log_std": jnp.zeros((act_dim,), dtype),
    }


def cnn_actor_critic_apply(params, pixels):
    """-> (mean, log_std, value) from (..., H, W, 3) pixels."""
    feat = cnn_torso_apply(params["torso"], pixels)
    mean = mlp_apply(params["actor"], feat)
    value = mlp_apply(params["critic"], feat)[..., 0]
    return mean, params["log_std"], value
