"""Batched (vectorized) environments over a device mesh.

The reference is strictly single-env, single-process (`run.py:48`,
`train.py:224` carry "TODO: parallelise" comments); this module is the
TPU-native replacement: thousands of lockstep env instances under one jit,
sharded across chips along the `env` mesh axis.  All collectives are
emitted by XLA from sharding annotations — there is no hand-written
communication.
"""
from __future__ import annotations


from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..envs.base import AdroitEnv, EnvState


class VectorEnv:
    """vmap-lifted AdroitEnv with optional mesh sharding on the env axis.

    `reset(key, n)` -> batched EnvState; `step(state, actions)` ->
    batched EnvState with auto-reset.  When a mesh is given, states and
    actions are constrained to env-axis sharding so the whole rollout
    runs SPMD across chips.
    """

    def __init__(self, env: AdroitEnv, num_envs: int,
                 mesh: Optional[Mesh] = None, env_axis: str = "env"):
        self.env = env
        self.num_envs = num_envs
        self.mesh = mesh
        self.env_axis = env_axis

        self._reset = jax.vmap(env.reset)
        self._step = jax.vmap(env.step_auto_reset)
        self._step_no_reset = jax.vmap(env.step)

        if mesh is not None:
            self._shard = NamedSharding(mesh, P(env_axis))
            self._constraint = lambda tree: jax.lax.with_sharding_constraint(
                tree, self._shard)
        else:
            self._constraint = lambda tree: tree

    def reset(self, key: jax.Array) -> EnvState:
        keys = jax.random.split(key, self.num_envs)
        if self.mesh is not None:
            keys = jax.device_put(keys, self._shard)
        state = self._reset(keys)
        return self._constraint(state)

    def step(self, state: EnvState, actions: jnp.ndarray) -> EnvState:
        """Auto-resetting batched step (the RL rollout primitive)."""
        return self._constraint(self._step(state, actions))

    def step_no_reset(self, state: EnvState,
                      actions: jnp.ndarray) -> EnvState:
        """Plain batched step (parity testing / fixed-length eval)."""
        return self._constraint(self._step_no_reset(state, actions))

def random_actions(key: jax.Array, num_envs: int, nu: int,
                   dtype=jnp.float32) -> jnp.ndarray:
    return jax.random.uniform(key, (num_envs, nu), dtype, -1.0, 1.0)
