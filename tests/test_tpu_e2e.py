"""Opportunistic REAL-TPU end-to-end test (VERDICT r2 item 2b).

The pytest suite pins JAX_PLATFORMS=cpu (conftest.py) for f64 parity and
virtual meshes — which is exactly the hole the round-2 regression walked
through: no test ever stepped an env on the TPU backend, so the noslip
Pallas kernel's VMEM blow-up at batch > 128 (grid > 1) shipped unnoticed.

This test runs a CHILD process without the CPU pin that jits a 512-env
`step_auto_reset` on hammer-v0 on the default backend:

* backend == tpu and the step works  -> PASS (finite qpos/obs)
* backend == tpu and compile/run dies -> FAIL (the r2 bug reproduces)
* no TPU available / tunnel hung      -> SKIP (opportunistic by design)
"""
import os
import subprocess
import sys

import pytest

_CHILD = r"""
import jax, jax.numpy as jnp
print("BACKEND=" + jax.default_backend(), flush=True)
if jax.default_backend() != "tpu":
    raise SystemExit(3)          # sentinel: not a TPU -> skip
from mj_envs_tpu import envs
env = envs.make("hammer-v0")
B = 512                          # > 128 so the Pallas grid is > 1
st = jax.jit(jax.vmap(env.reset))(jax.random.split(jax.random.PRNGKey(0), B))
step = jax.jit(jax.vmap(env.step_auto_reset))
key = jax.random.PRNGKey(1)
for _ in range(2):
    key, ka = jax.random.split(key)
    a = jax.random.uniform(ka, (B, env.nu), jnp.float32, -1.0, 1.0)
    st = step(st, a)
jax.block_until_ready(st.obs)
ok = bool(jnp.all(jnp.isfinite(st.obs)) & jnp.all(jnp.isfinite(st.data.qpos)))
print("FINITE=" + str(ok), flush=True)
raise SystemExit(0 if ok else 1)
"""


def test_tpu_step_512_envs():
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)       # undo the suite-wide CPU pin
    env.pop("XLA_FLAGS", None)           # no virtual-device forcing
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    try:
        out = subprocess.run(
            [sys.executable, "-c", _CHILD], capture_output=True,
            text=True, cwd=repo, env=env,
            timeout=float(os.environ.get("MJE_TPU_TEST_TIMEOUT", 600)))
    except subprocess.TimeoutExpired:
        pytest.skip("TPU backend init/compile timed out (tunnel down?)")
    if out.returncode == 3:
        pytest.skip(f"no TPU backend available "
                    f"({out.stdout.strip().splitlines()[-1:]}) ")
    assert out.returncode == 0, (
        "512-env hammer step FAILED on the TPU backend (the round-2 "
        "noslip-VMEM regression class).\nstdout tail: "
        + "\n".join(out.stdout.splitlines()[-5:])
        + "\nstderr tail: " + "\n".join(out.stderr.splitlines()[-15:]))
    assert "FINITE=True" in out.stdout
