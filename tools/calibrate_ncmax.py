"""Measure the peak in-margin contact count across random-action rollouts
for every task, to size pipeline._ncmax (the active-contact slot budget:
solver rows scale with it, noslip sweep cost quadratically).

    NUM_ENVS=256 STEPS=200 python tools/calibrate_ncmax.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from mj_envs_tpu import envs
from mj_envs_tpu.envs import base as EB
from mj_envs_tpu.physics import pipeline

NUM_ENVS = int(os.environ.get("NUM_ENVS", "256"))
STEPS = int(os.environ.get("STEPS", "200"))
TASKS = os.environ.get("TASKS", "hammer,door,pen,relocate").split(",")


def main():
    print(f"backend={jax.default_backend()} envs={NUM_ENVS} steps={STEPS}",
          flush=True)
    for task in TASKS:
        env = envs.make(f"{task}-v0")

        def stepped(s, a):
            """env.step, but also return the across-substep peak
            ncon_active (env.step itself only exposes the boolean
            clipped flag)."""
            model = EB._apply_var(env.model, s.var)
            ctrl = env.act_mid + jnp.clip(a, -1, 1) * env.act_rng

            def substep(d, _):
                d = pipeline.step(model, d, ctrl)
                return d, d.ncon_active

            d, ncon_seq = jax.lax.scan(substep, s.data, (),
                                       length=env.FRAME_SKIP)
            return s.replace(data=d), jnp.max(ncon_seq)

        def rollout(st, key):
            def body(carry, _):
                s, kk, peak = carry
                kk, ka = jax.random.split(kk)
                a = jax.random.uniform(
                    ka, (NUM_ENVS, env.nu), jnp.float32, -1.0, 1.0)
                s, p = jax.vmap(stepped)(s, a)
                peak = jnp.maximum(peak, jnp.max(p))
                return (s, kk, peak), ()
            (st, _, peak), _ = jax.lax.scan(
                body, (st, key, jnp.zeros((), jnp.int32)), (),
                length=STEPS)
            return peak

        key = jax.random.PRNGKey(7)
        st = jax.jit(jax.vmap(env.reset))(jax.random.split(key, NUM_ENVS))
        peak = int(jax.jit(rollout)(st, key))
        print(f"{task:10s} peak ncon_active = {peak} "
              f"(ncmax now {pipeline._ncmax(env.spec)})", flush=True)


if __name__ == "__main__":
    main()
