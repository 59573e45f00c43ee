"""Accuracy probe for the noslip sweep's tolerance early-exit (TPU f32).

The per-block exit (`kernels._noslip_kernel`, MJE_NOSLIP_TOL) stops
sweeping once the largest per-sweep force update drops below
tol * (largest box bound in the block).  The CPU scan path always runs
the full trip count, so CPU tests cannot bound the TPU-path error —
this probe does it on the hardware: roll hammer-v0 forward with random
actions to reach contact-rich states, then solve the SAME states with
tol=0 (full 20 sweeps, the historical behavior) and with the candidate
tolerance, and report the qacc/qvel deltas.

    MJE_NOSLIP_TOL=1e-3 python tools/noslip_tol_probe.py

Decision record (v5e, 512 envs, 40 warm steps, hammer):
tol=1e-3 max |dqacc| ~ 6e-3 rad/s^2 on qacc magnitudes of O(10^2)
(max rel ~ 1e-4 of the batch qacc scale), i.e. below f32 solver noise
from upstream stages — which is why 1e-3 is the shipped default
(+5% rollout throughput at the 4096-env north-star config).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from mj_envs_tpu import envs
from mj_envs_tpu.physics import pipeline

NUM_ENVS = int(os.environ.get("NUM_ENVS", "512"))
WARM_STEPS = int(os.environ.get("WARM_STEPS", "40"))
TOL = os.environ.get("MJE_NOSLIP_TOL", "1e-3")


def main():
    env = envs.make(os.environ.get("TASK", "hammer") + "-v0")
    key = jax.random.PRNGKey(0)
    state = jax.jit(jax.vmap(env.reset))(jax.random.split(key, NUM_ENVS))

    def roll(state, k):
        def body(carry, _):
            st, kk = carry
            kk, ka = jax.random.split(kk)
            a = jax.random.uniform(ka, (NUM_ENVS, env.nu), jnp.float32,
                                   -1.0, 1.0)
            return (jax.vmap(env.step_auto_reset)(st, a), kk), ()
        (state, k), _ = jax.lax.scan(body, (state, k), (),
                                     length=WARM_STEPS)
        return state
    state = jax.jit(roll)(state, key)
    jax.block_until_ready(state.obs)

    m = env.model
    d = state.data

    def one_substep(d, ctrl):
        return jax.vmap(lambda dd, cc: pipeline.step(m, dd, cc))(d, ctrl)

    ctrl = jax.random.uniform(jax.random.PRNGKey(1),
                              (NUM_ENVS, env.nu), jnp.float32, -1.0, 1.0)

    outs = {}
    for tol in ("0", TOL):
        os.environ["MJE_NOSLIP_TOL"] = tol
        # Fresh function identity -> fresh trace -> the env var is
        # re-read at trace time (solver.noslip reads it per trace).
        f = jax.jit(lambda d, c: one_substep(d, c))
        t0 = time.perf_counter()
        out = f(d, ctrl)
        jax.block_until_ready(out.qacc)
        outs[tol] = out
        print(f"tol={tol}: substep compiled+ran in "
              f"{time.perf_counter() - t0:.2f}s")

    a, b = outs["0"], outs[TOL]
    dqacc = np.abs(np.asarray(a.qacc) - np.asarray(b.qacc))
    dqvel = np.abs(np.asarray(a.qvel) - np.asarray(b.qvel))
    qscale = float(np.max(np.abs(np.asarray(a.qacc))))
    print(f"envs={NUM_ENVS} warm={WARM_STEPS} tol={TOL}")
    print(f"max |dqacc| = {dqacc.max():.3e}  (qacc scale {qscale:.3e}, "
          f"rel {dqacc.max() / max(qscale, 1e-30):.3e})")
    print(f"max |dqvel after one h| = {dqvel.max():.3e}")


if __name__ == "__main__":
    main()
