"""Two-process distributed rollout test (CPU, no TPU hardware needed).

Each worker process owns 4 virtual CPU devices; `jax.distributed`
forms an 8-device global runtime and one (env, model) mesh across both
processes.  Each process resets its LOCAL slice of the global env batch,
the global EnvState is assembled with
`jax.make_array_from_process_local_data`, and a jitted rollout step runs
SPMD — the learner-side metric (global mean reward) must come out
IDENTICAL on both processes, proving the cross-process collectives and
the env-axis sharding actually work.  This is the same code path a TPU
pod slice takes (one process per host), per `parallel/distributed.py`.
"""
import os
import socket
import subprocess
import sys

import pytest

_THIS = os.path.abspath(__file__)


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_rollout():
    port = _free_port()
    procs = []
    sys.path.insert(0, os.path.dirname(os.path.dirname(_THIS)))
    from mj_envs_tpu.utils.hostcpu import scrub_axon_env
    for pid in range(2):
        env = scrub_axon_env(dict(os.environ))
        env.update(
            JAX_PLATFORMS="cpu",
            XLA_FLAGS="--xla_force_host_platform_device_count=4",
            JAX_COORDINATOR_ADDRESS=f"127.0.0.1:{port}",
            JAX_NUM_PROCESSES="2",
            JAX_PROCESS_ID=str(pid),
        )
        procs.append(subprocess.Popen(
            [sys.executable, _THIS, "--worker"],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True,
            cwd=os.path.dirname(os.path.dirname(_THIS))))
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=900)
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {i} failed:\n{out}"
    lines = [
        [ln for ln in out.splitlines() if ln.startswith("RESULT ")]
        for out in outs
    ]
    assert lines[0] and lines[1], (outs[0], outs[1])
    # identical global metric on every process
    assert lines[0][-1] == lines[1][-1], (lines[0][-1], lines[1][-1])


def _worker():
    import numpy as np
    import jax
    import jax.numpy as jnp
    from mj_envs_tpu.parallel import distributed as DIST
    from mj_envs_tpu import envs

    DIST.initialize()
    assert jax.process_count() == 2, jax.process_count()
    assert jax.device_count() == 8
    mesh = DIST.make_mesh(model_axis=1)

    env = envs.make("hammer-v0")
    GLOBAL_B = 8
    local_b, offset = DIST.process_local_batch(mesh, GLOBAL_B)
    assert local_b == 4

    # Every process resets ITS OWN envs with globally-consistent keys.
    all_keys = jax.random.split(jax.random.PRNGKey(0), GLOBAL_B)
    local_keys = np.asarray(all_keys)[offset:offset + local_b]
    local_state = jax.vmap(env.reset)(jnp.asarray(local_keys))
    local_state = jax.tree_util.tree_map(np.asarray, local_state)
    state = DIST.global_env_state(mesh, local_state)

    @jax.jit
    def rollout2(state):
        def body(st, i):
            a = jnp.zeros((GLOBAL_B, env.nu), st.obs.dtype)
            st = jax.vmap(env.step_auto_reset)(st, a)
            return st, st.reward.mean()
        st, r = jax.lax.scan(body, state, jnp.arange(2))
        return st, r.sum()

    state, total = rollout2(state)
    jax.block_until_ready(total)
    # the reduction crossed processes: every process must agree
    print(f"RESULT {float(total):.10f}", flush=True)


if __name__ == "__main__":
    if "--worker" in sys.argv:
        sys.path.insert(0, os.path.dirname(os.path.dirname(_THIS)))
        _worker()
