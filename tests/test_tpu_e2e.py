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
env = envs.make("TASK_ID")
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


# Each task compiles a DIFFERENT program: pen has the most contacts and a
# different (R, nv); door is frame_skip=1 with arm slide dofs; relocate
# is the largest nv (36).  A kernel-shape regression in any of them would
# hide behind a hammer-only gate (VERDICT r4 item 7).
@pytest.mark.parametrize(
    "task", ["hammer-v0", "door-v0", "pen-v0", "relocate-v0"])
def test_tpu_step_512_envs(task):
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)       # undo the suite-wide CPU pin
    env.pop("XLA_FLAGS", None)           # no virtual-device forcing
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    try:
        out = subprocess.run(
            [sys.executable, "-c", _CHILD.replace("TASK_ID", task)],
            capture_output=True,
            text=True, cwd=repo, env=env,
            timeout=float(os.environ.get("MJE_TPU_TEST_TIMEOUT", 900)))
    except subprocess.TimeoutExpired:
        pytest.skip("TPU backend init/compile timed out (tunnel down?)")
    if out.returncode == 3:
        pytest.skip(f"no TPU backend available "
                    f"({out.stdout.strip().splitlines()[-1:]}) ")
    assert out.returncode == 0, (
        f"512-env {task} step FAILED on the TPU backend (the round-2 "
        "noslip-VMEM regression class).\nstdout tail: "
        + "\n".join(out.stdout.splitlines()[-5:])
        + "\nstderr tail: " + "\n".join(out.stderr.splitlines()[-15:]))
    assert "FINITE=True" in out.stdout


_FK_CHILD = r"""
import numpy as np
import jax, jax.numpy as jnp
print("BACKEND=" + jax.default_backend(), flush=True)
if jax.default_backend() != "tpu":
    raise SystemExit(3)
from mj_envs_tpu import envs
from mj_envs_tpu.physics import kinematics as K
from mj_envs_tpu.physics import fk_kernel as FK
env = envs.make("hammer-v0")
m = env.model
B = 256                              # grid > 1
st = jax.jit(jax.vmap(env.reset))(jax.random.split(jax.random.PRNGKey(7), B))
step = jax.jit(jax.vmap(env.step))
for _ in range(3):
    st = step(st, 0.3 * jnp.ones((B, env.nu), jnp.float32))
qpos = st.data.qpos
mb = jax.tree.map(lambda x: False, m)
got = jax.jit(lambda q: K.Kin(*FK.fk_pallas(m, q, mb)))(qpos)
want = jax.jit(lambda q: jax.vmap(
    K._kinematics_ref, in_axes=(None, 0))(m, q))(qpos)
ok = True
for f in K.Kin._fields:
    a, b = np.asarray(getattr(got, f)), np.asarray(getattr(want, f))
    err = float(np.max(np.abs(a - b)))
    print(f"{f}: {err:.3e}", flush=True)
    ok &= np.isfinite(err) and err <= 2e-5
print("FK_OK=" + str(bool(ok)), flush=True)
raise SystemExit(0 if ok else 1)
"""


def test_tpu_fk_kernel_matches_reference():
    """Fused FK Pallas kernel vs the unrolled-tree reference, on the
    REAL chip at grid > 1 (interpret mode is impractically slow for the
    ~5k-op unrolled kernel, so this is the primary equivalence gate)."""
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env.pop("XLA_FLAGS", None)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    try:
        out = subprocess.run(
            [sys.executable, "-c", _FK_CHILD], capture_output=True,
            text=True, cwd=repo, env=env,
            timeout=float(os.environ.get("TPU_E2E_TIMEOUT", 1500)))
    except subprocess.TimeoutExpired:
        pytest.skip("TPU backend unavailable or tunnel hung")
    if out.returncode == 3:
        pytest.skip("no TPU backend (got %s)" % (out.stdout.strip() or "?"))
    assert out.returncode == 0, (
        f"FK kernel mismatch or crash on TPU:\n{out.stdout}\n{out.stderr[-2000:]}")
