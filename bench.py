"""Headline benchmark: env-steps/s/chip, hammer-v0, 4096 vectorized envs.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

`vs_baseline` is measured live against the reference's engine on this
machine: single-env mujoco (C physics, one core) stepping the same
sanitized hammer scene with frame_skip=5 — the reference stack's
throughput ceiling per `SURVEY.md` §6 (the reference itself publishes no
numbers; it steps ONE env on CPU through mujoco-py).
"""
import json
import os
import sys
import time

NUM_ENVS = int(os.environ.get("BENCH_NUM_ENVS", 4096))
MEASURE_STEPS = int(os.environ.get("BENCH_STEPS", 20))


def bench_oracle_steps_per_s() -> float:
    """Reference-stack throughput: mujoco C, single env, 1 core."""
    try:
        import mujoco
        import numpy as np
        from mj_envs_tpu.mjcf import oracle as O
        mm = mujoco.MjModel.from_xml_string(O.sanitize(
            O.task_xml_path("hammer")))
        md = mujoco.MjData(mm)
        mujoco.mj_forward(mm, md)
        rng = np.random.default_rng(0)
        n, t0 = 0, time.perf_counter()
        while time.perf_counter() - t0 < 1.0:
            md.ctrl[:] = rng.uniform(-1, 1, mm.nu)
            for _ in range(5):
                mujoco.mj_step(mm, md)
            n += 1
        return n / (time.perf_counter() - t0)
    except Exception:
        return float("nan")


def main():
    import jax
    import jax.numpy as jnp
    from mj_envs_tpu import envs

    backend = jax.default_backend()
    num_envs = NUM_ENVS if backend == "tpu" else min(NUM_ENVS, 256)

    env = envs.make("hammer-v0")
    key = jax.random.PRNGKey(0)
    reset = jax.jit(jax.vmap(env.reset))
    v_step = jax.vmap(env.step_auto_reset)

    # One fused rollout program (the shape real training uses: the whole
    # rollout lives in a single XLA program — per-call dispatch overhead
    # through the TPU tunnel would otherwise dominate).
    def rollout(state, k):
        def body(carry, _):
            st, kk = carry
            kk, ka = jax.random.split(kk)
            a = jax.random.uniform(ka, (num_envs, env.nu), jnp.float32,
                                   -1.0, 1.0)
            st = v_step(st, a)
            return (st, kk), ()
        (state, k), _ = jax.lax.scan(body, (state, k), (),
                                     length=MEASURE_STEPS)
        return state, k

    rollout_j = jax.jit(rollout, donate_argnums=(0,))

    state = reset(jax.random.split(key, num_envs))
    jax.block_until_ready(state.obs)

    # Warmup (compile).
    state, k = rollout_j(state, key)
    jax.block_until_ready(state.obs)

    t0 = time.perf_counter()
    state, k = rollout_j(state, k)
    jax.block_until_ready(state.obs)
    dt = time.perf_counter() - t0

    steps_per_s = num_envs * MEASURE_STEPS / dt
    oracle = bench_oracle_steps_per_s()
    vs = steps_per_s / oracle if oracle == oracle else -1.0
    print(json.dumps({
        "metric": f"hammer-v0 env-steps/s/chip @ {num_envs} envs "
                  f"({backend})",
        "value": round(steps_per_s, 1),
        "unit": "env-steps/s",
        "vs_baseline": round(vs, 2),
    }))


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    main()
