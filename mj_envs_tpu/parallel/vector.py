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


def chunked_vmap(fn, chunk_size: int):
    """`jax.vmap(fn)` evaluated in SEQUENTIAL chunks of `chunk_size`.

    Why: the physics substep contains a data-dependent
    `lax.while_loop` (the Newton solver's early exit, solver.py) whose
    trip count under vmap is the max over the WHOLE batch — one
    slow-converging env makes all B envs pay extra iterations, so
    per-env cost grows with batch (measured on v5e, hammer-v0 random
    actions: 32.9 us/env-step @1024 -> 45.9 @4096).  Mapping the batch
    through `lax.map` over chunks lets each chunk's loops exit
    independently: one hard env stalls `chunk_size` envs, not B.
    Measured @4096: 33.7 us/env-step with 1024-chunks (+36% throughput)
    — the tail cost is ~log(B), so smaller per-loop batches win far
    more than the K-fold sequential dispatch costs.  Peak memory also
    drops to one chunk's intermediates.

    Falls back to plain vmap when the batch is not divisible by (or not
    larger than) `chunk_size`.  Chunk boundaries only change op
    scheduling, not per-env math.
    """
    vf = jax.vmap(fn)
    if chunk_size <= 0:
        return vf

    def run(*args):
        B = jax.tree.leaves(args)[0].shape[0]
        if B <= chunk_size or B % chunk_size != 0:
            return vf(*args)
        K = B // chunk_size
        ac = jax.tree.map(
            lambda x: x.reshape((K, chunk_size) + x.shape[1:]), args)
        out = jax.lax.map(lambda a: vf(*a), ac)
        return jax.tree.map(
            lambda x: x.reshape((B,) + x.shape[2:]), out)
    return run


class VectorEnv:
    """vmap-lifted AdroitEnv with optional mesh sharding on the env axis.

    `reset(key, n)` -> batched EnvState; `step(state, actions)` ->
    batched EnvState with auto-reset.  When a mesh is given, states and
    actions are constrained to env-axis sharding so the whole rollout
    runs SPMD across chips.

    `chunk_size` (default 512): evaluate the batched step in
    sequential chunks (see `chunked_vmap`) — the large-batch throughput
    fix for the solver's batch-wide while_loop convergence.  Set 0 to
    disable.  On a multi-chip mesh each chunk still spans all devices;
    the per-device while_loop condition is a global psum either way, so
    chunking composes with (and is orthogonal to) sharding.
    """

    def __init__(self, env: AdroitEnv, num_envs: int,
                 mesh: Optional[Mesh] = None, env_axis: str = "env",
                 chunk_size: int = 512):
        self.env = env
        self.num_envs = num_envs
        self.mesh = mesh
        self.env_axis = env_axis
        self.chunk_size = chunk_size

        self._reset = jax.vmap(env.reset)
        self._step = chunked_vmap(env.step_auto_reset, chunk_size)
        self._step_no_reset = chunked_vmap(env.step, chunk_size)

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
