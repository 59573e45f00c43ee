"""Pin a process to the host-CPU JAX backend.

The axon TPU plugin (when its sitecustomize is active) registers a
backend factory whose initialization dials the TPU tunnel and can block
indefinitely if the tunnel is down — even under JAX_PLATFORMS=cpu,
because registration happened at interpreter start before the env var
could take effect on jax's latched config.  `pin_cpu()` makes CPU-only
execution deterministic: call it before the first backend use (tests,
CPU workers, virtual-mesh harnesses).
"""
import os


def pin_cpu(virtual_devices: int | None = None) -> None:
    os.environ["JAX_PLATFORMS"] = "cpu"
    if virtual_devices:
        flags = os.environ.get("XLA_FLAGS", "")
        if "xla_force_host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags + f" --xla_force_host_platform_device_count="
                f"{virtual_devices}").strip()
    import jax
    jax.config.update("jax_platforms", "cpu")
    try:
        import jax._src.xla_bridge as xb
        xb._backend_factories.pop("axon", None)
    except Exception:
        pass


def scrub_axon_env(env: dict) -> dict:
    """Remove the axon plugin's activation vars from a subprocess env so
    its sitecustomize never registers the TPU factory."""
    for k in list(env):
        if k.startswith(("PALLAS_AXON", "AXON_")):
            env.pop(k)
    return env
