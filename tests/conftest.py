"""Test configuration.

Physics parity tests run on CPU in float64 (TPU f64 is emulated/slow); the
8 virtual host devices let multi-chip sharding tests (`jax.sharding.Mesh`)
run without TPU hardware, mirroring how the driver dry-runs
`__graft_entry__.dryrun_multichip`.
"""
import os
import sys

# Tests are CPU-only (f64 parity; virtual 8-device mesh).  The axon TPU
# plugin registers at interpreter start (sitecustomize) and initializes
# even under JAX_PLATFORMS=cpu, dialing the TPU tunnel — which blocks
# for minutes (or forever, if the tunnel is down).  Since sitecustomize
# already imported jax, setting the env var alone is too late: pin the
# config AND drop the axon backend factory before any backend
# initialization.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
try:  # drop the axon TPU factory registered by sitecustomize (see above)
    import jax._src.xla_bridge as _xb
    _xb._backend_factories.pop("axon", None)
except Exception:
    pass

import mj_envs_tpu  # noqa: F401  (f32-matmul precision config; the
# persistent compile cache is TPU-only — see enable_compilation_cache)

jax.config.update("jax_enable_x64", True)
jax.config.update("jax_default_device", jax.devices("cpu")[0])

import pytest  # noqa: E402


REFERENCE_ASSETS = "/root/reference/mj_envs_vision/hand_manipulation_suite/assets"


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """XLA:CPU segfaults (natively, inside backend_compile_and_load)
    when compiling a LARGE program late in a process that has already
    JIT-loaded dozens of big executables — reproduced three times at the
    same suite position (golden-policy eval-rollout compiles), while the
    same tests pass in a fresh process.  Dropping compiled executables
    between test modules keeps the live-JIT footprint near a fresh
    process's.  Costs per-module recompiles of shared programs; sharing
    across modules was minimal anyway (signatures differ)."""
    yield
    jax.clear_caches()


def has_mujoco() -> bool:
    try:
        import mujoco  # noqa: F401
        return True
    except ImportError:
        return False


requires_mujoco = pytest.mark.skipif(
    not has_mujoco(), reason="mujoco oracle not installed"
)
requires_reference = pytest.mark.skipif(
    not os.path.isdir(REFERENCE_ASSETS), reason="reference assets not mounted"
)
