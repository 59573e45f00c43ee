"""Scaling-efficiency harness: env-steps/s vs device count.

Shards a fixed-work-per-device rollout (weak scaling: ENVS_PER_DEV envs
per device) over 1, 2, 4, ... devices of the current backend and reports
throughput and efficiency vs linear scaling (BASELINE target >= 80%).

On the single-chip axon setup this runs on virtual CPU devices
(XLA_FLAGS=--xla_force_host_platform_device_count=8) to validate the
sharded program structure; on a real pod slice the same code measures
true ICI scaling — there is no code path difference (SPMD via one mesh).

    ENVS_PER_DEV=128 STEPS=20 python tools/scaling_bench.py
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if os.environ.get("FORCE_CPU", "0") == "1":
    from mj_envs_tpu.utils.hostcpu import pin_cpu
    pin_cpu(virtual_devices=8)

import numpy as np
import jax
import jax.numpy as jnp

from mj_envs_tpu import envs
from mj_envs_tpu.parallel import distributed as DIST

ENVS_PER_DEV = int(os.environ.get("ENVS_PER_DEV", "128"))
STEPS = int(os.environ.get("STEPS", "20"))
TASK = os.environ.get("TASK", "hammer-v0")


def measure(env, n_dev: int) -> float:
    mesh = DIST.make_mesh(model_axis=1, devices=jax.devices()[:n_dev])
    num_envs = ENVS_PER_DEV * n_dev
    shard = DIST.env_sharding(mesh)

    keys = jax.device_put(
        jax.random.split(jax.random.PRNGKey(0), num_envs), shard)
    state = jax.jit(jax.vmap(env.reset))(keys)

    def rollout(state, key):
        def body(carry, _):
            st, k = carry
            k, ka = jax.random.split(k)
            a = jax.random.uniform(ka, (num_envs, env.nu),
                                   st.obs.dtype, -1.0, 1.0)
            a = jax.lax.with_sharding_constraint(a, shard)
            return (jax.vmap(env.step_auto_reset)(st, a), k), ()
        (state, _), _ = jax.lax.scan(body, (state, key), (), length=STEPS)
        return state

    ro = jax.jit(rollout, donate_argnums=(0,))
    state = ro(state, jax.random.PRNGKey(1))
    jax.block_until_ready(state.obs)          # compile + warmup

    best = 0.0
    for i in range(3):
        t0 = time.perf_counter()
        state = ro(state, jax.random.PRNGKey(2 + i))
        jax.block_until_ready(state.obs)
        dt = time.perf_counter() - t0
        best = max(best, num_envs * STEPS / dt)
    return best


def main():
    DIST.initialize()
    env = envs.make(TASK)
    n_total = jax.device_count()
    counts = [c for c in (1, 2, 4, 8, 16, 32) if c <= n_total]
    print(f"backend={jax.default_backend()} devices={n_total} "
          f"task={TASK} envs/dev={ENVS_PER_DEV}", flush=True)
    base = None
    rows = []
    for c in counts:
        sps = measure(env, c)
        if base is None:
            base = sps
        eff = sps / (base * c) * 100.0
        rows.append(dict(devices=c, steps_per_s=round(sps, 1),
                         efficiency_pct=round(eff, 1)))
        print(f"devices={c:3d}  {sps:12.1f} env-steps/s  "
              f"weak-scaling eff {eff:6.1f}%", flush=True)
    print(json.dumps(rows))


if __name__ == "__main__":
    main()
