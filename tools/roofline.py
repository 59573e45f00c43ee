"""Roofline / MFU analysis of the physics substep (VERDICT r1 item 2:
"a roofline/MFU note in BASELINE.md justifying how far from SOL it is").

Uses XLA's own compile-time cost model (`compiled.cost_analysis()`:
flops + bytes accessed) on the jitted, vmapped substep, then derives the
speed-of-light time at the target chip's peak FLOP/s and HBM bandwidth:

    SOL time = max(flops / peak_flops, bytes / peak_bw)
    MFU      = sol_compute_time / measured_time

Run on any backend (the cost model is backend-independent up to fusion
choices); pass a measured wall-clock from tools/profile_substep.py on
TPU to get the MFU line.

    NUM_ENVS=1024 MEASURED_MS=74.7 python tools/roofline.py

Peak numbers default to a TPU v5e-class chip; override with
PEAK_TFLOPS / PEAK_GBPS.
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

NUM_ENVS = int(os.environ.get("NUM_ENVS", "256"))
TASK = os.environ.get("TASK", "hammer")
PEAK_TFLOPS = float(os.environ.get("PEAK_TFLOPS", "197"))  # bf16; ~98 f32
PEAK_GBPS = float(os.environ.get("PEAK_GBPS", "819"))
MEASURED_MS = os.environ.get("MEASURED_MS")


def main():
    import jax
    import jax.numpy as jnp
    from mj_envs_tpu import envs
    from mj_envs_tpu.physics import pipeline

    env = envs.make(f"{TASK}-v0")
    m = env.model

    def substep(qpos, qvel, ctrl):
        from mj_envs_tpu.physics.model import make_data
        d = make_data(m, dtype=qpos.dtype)
        d = d.replace(qpos=qpos, qvel=qvel)
        return pipeline.step(m, d, ctrl).qpos

    nq, nv, nu = m.spec.nq, m.spec.nv, m.spec.nu
    args = (jnp.zeros((NUM_ENVS, nq), jnp.float32),
            jnp.zeros((NUM_ENVS, nv), jnp.float32),
            jnp.zeros((NUM_ENVS, nu), jnp.float32))
    compiled = jax.jit(jax.vmap(substep)).lower(*args).compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, list):     # older jax returns [dict]
        ca = ca[0]
    flops = float(ca.get("flops", float("nan")))
    bytes_acc = float(ca.get("bytes accessed", float("nan")))

    sol_compute_s = flops / (PEAK_TFLOPS * 1e12)
    sol_memory_s = bytes_acc / (PEAK_GBPS * 1e9)
    sol_s = max(sol_compute_s, sol_memory_s)
    bound = "memory" if sol_memory_s > sol_compute_s else "compute"

    out = {
        "task": TASK, "num_envs": NUM_ENVS,
        "flops_per_substep": flops,
        "bytes_per_substep": bytes_acc,
        "flops_per_env": flops / NUM_ENVS,
        "bytes_per_env": bytes_acc / NUM_ENVS,
        "arithmetic_intensity_flops_per_byte": flops / bytes_acc,
        "sol_ms_compute": sol_compute_s * 1e3,
        "sol_ms_memory": sol_memory_s * 1e3,
        "sol_ms": sol_s * 1e3,
        "bound": bound,
        "peak_tflops": PEAK_TFLOPS, "peak_gbps": PEAK_GBPS,
    }
    if MEASURED_MS:
        meas = float(MEASURED_MS)
        out["measured_ms"] = meas
        out["fraction_of_sol"] = (sol_s * 1e3) / meas
        out["mfu"] = sol_compute_s * 1e3 / meas
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
