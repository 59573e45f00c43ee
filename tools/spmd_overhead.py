"""SPMD overhead on the real chip (VERDICT r4 item 6).

The >=80% ICI weak-scaling target is unmeasurable here (one v5e chip
through a tunnel; virtual CPU devices share physical cores).  What IS
measurable on the available hardware: the cost of running the rollout
program *under a mesh with sharding constraints* vs plain unsharded, on
a 1-device (env, model) mesh.  That bounds the per-program SPMD overhead
(sharding constraints, partitioner passes, resharding copies) — it
should be ~0; a large number is a bug in our sharding layout.

    NUM_ENVS=1024 STEPS=20 python tools/spmd_overhead.py
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from mj_envs_tpu import envs
from mj_envs_tpu.parallel import distributed as DIST

NUM_ENVS = int(os.environ.get("NUM_ENVS", "1024"))
STEPS = int(os.environ.get("STEPS", "20"))
TASK = os.environ.get("TASK", "hammer-v0")
REPS = int(os.environ.get("REPS", "5"))


def measure(env, sharded: bool) -> float:
    num_envs = NUM_ENVS
    if sharded:
        mesh = DIST.make_mesh(model_axis=1, devices=jax.devices()[:1])
        shard = DIST.env_sharding(mesh)

    keys = jax.random.split(jax.random.PRNGKey(0), num_envs)
    if sharded:
        keys = jax.device_put(keys, shard)
    state = jax.jit(jax.vmap(env.reset))(keys)

    def rollout(state, key):
        def body(carry, _):
            st, k = carry
            k, ka = jax.random.split(k)
            a = jax.random.uniform(ka, (num_envs, env.nu),
                                   st.obs.dtype, -1.0, 1.0)
            if sharded:
                a = jax.lax.with_sharding_constraint(a, shard)
            return (jax.vmap(env.step_auto_reset)(st, a), k), ()
        (state, _), _ = jax.lax.scan(body, (state, key), (), length=STEPS)
        return state

    ro = jax.jit(rollout, donate_argnums=(0,))
    state = ro(state, jax.random.PRNGKey(1))
    jax.block_until_ready(state.obs)

    best = 0.0
    for i in range(REPS):
        t0 = time.perf_counter()
        state = ro(state, jax.random.PRNGKey(2 + i))
        jax.block_until_ready(state.obs)
        best = max(best, num_envs * STEPS / (time.perf_counter() - t0))
    return best


def main():
    env = envs.make(TASK)
    print(f"backend={jax.default_backend()} envs={NUM_ENVS} task={TASK}",
          flush=True)
    plain = measure(env, sharded=False)
    print(f"unsharded: {plain:12.1f} env-steps/s", flush=True)
    mesh1 = measure(env, sharded=True)
    print(f"1-dev mesh: {mesh1:11.1f} env-steps/s", flush=True)
    overhead = (plain - mesh1) / plain * 100.0
    out = {"task": TASK, "num_envs": NUM_ENVS,
           "backend": jax.default_backend(),
           "unsharded_steps_per_s": round(plain, 1),
           "mesh1_steps_per_s": round(mesh1, 1),
           "spmd_overhead_pct": round(overhead, 2)}
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
