"""Multi-process / multi-host runtime — the distributed backend the
reference lacks entirely (SURVEY §2 "Parallelism — reference status":
single process, single env, `run.py:48` "TODO: parallelise").

TPU-native design: one JAX process per host, `jax.distributed.initialize`
forms the global runtime, and a single `Mesh` over ALL devices carries
the `env` (data) and optional `model` axes.  Rollout state is sharded on
`env`; learner parameters are replicated (or model-sharded); every
collective (gradient psum, metric reductions) is emitted by XLA from the
sharding annotations — there is no hand-written NCCL/MPI analogue.

Verified without real multi-host hardware by `tests/test_multiprocess.py`
(two local processes x 4 virtual CPU devices each → one 8-device global
mesh) — the same code path a TPU pod slice takes.
"""
from __future__ import annotations

import os
from typing import Optional, Tuple

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """Join the global JAX runtime.

    With no arguments this reads the standard env vars
    (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID, or a
    TPU pod's automatic configuration) and is a NO-OP for plain
    single-process runs, so drivers can call it unconditionally.
    """
    if coordinator_address is None:
        coordinator_address = os.environ.get("JAX_COORDINATOR_ADDRESS")
    if num_processes is None:
        num_processes = int(os.environ.get("JAX_NUM_PROCESSES", "0")) or None
    if process_id is None:
        pid = os.environ.get("JAX_PROCESS_ID")
        process_id = int(pid) if pid is not None else None
    if coordinator_address is None and num_processes is None:
        return  # single process; nothing to join
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id)


def make_mesh(model_axis: int = 1,
              devices=None) -> Mesh:
    """Global (env, model) mesh over all devices of all processes.

    The env axis carries batch/data parallelism for the physics; the
    model axis (usually 1 — the MLPs here are tiny) is reserved for
    tensor-parallel learners (e.g. the PlaNet conv encoder at scale).
    """
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    assert n % model_axis == 0, (n, model_axis)
    arr = np.asarray(devices).reshape(n // model_axis, model_axis)
    return Mesh(arr, ("env", "model"))


def env_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("env"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_env_state(mesh: Mesh, state):
    """Constrain a batched EnvState pytree to env-axis sharding."""
    return jax.device_put(state, env_sharding(mesh))


def process_local_batch(mesh: Mesh, global_num_envs: int) -> Tuple[int, int]:
    """(local_envs, offset): this process's slice of the global env
    batch when the env axis is sharded across processes."""
    n_env_shards = mesh.shape["env"]
    assert global_num_envs % n_env_shards == 0
    per_shard = global_num_envs // n_env_shards
    # devices are laid out process-major in jax.devices()
    local_env_rows = [
        i for i in range(n_env_shards)
        if mesh.devices[i, 0].process_index == jax.process_index()]
    local = per_shard * len(local_env_rows)
    offset = per_shard * (local_env_rows[0] if local_env_rows else 0)
    return local, offset


def global_env_state(mesh: Mesh, local_state):
    """Assemble a GLOBAL env-sharded state array tree from each
    process's local batch (jax.make_array_from_process_local_data) —
    the rollout init path on a pod: every host resets its own envs, the
    learner sees one logical (global_B, ...) tree."""
    sharding = env_sharding(mesh)

    def assemble(x):
        return jax.make_array_from_process_local_data(sharding, np.asarray(x))

    return jax.tree_util.tree_map(assemble, local_state)
