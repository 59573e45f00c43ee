"""Test configuration.

Physics parity tests run on CPU in float64 (TPU f64 is emulated/slow); the
8 virtual host devices let multi-chip sharding tests (`jax.sharding.Mesh`)
run without TPU hardware, mirroring how the driver dry-runs
`__graft_entry__.dryrun_multichip`.
"""
import os
import sys

# Must be set before jax is imported anywhere.  Note: under the axon TPU
# plugin JAX_PLATFORMS is not honored (the plugin registers regardless), so
# we additionally pin jax_default_device to CPU below.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

import mj_envs_tpu  # noqa: F401  (enables the persistent compile cache)

jax.config.update("jax_enable_x64", True)
jax.config.update("jax_default_device", jax.devices("cpu")[0])

import pytest  # noqa: E402


REFERENCE_ASSETS = "/root/reference/mj_envs_vision/hand_manipulation_suite/assets"


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
