"""Vision-path benchmark on the current backend (VERDICT r4 item 5).

The reference's second hot path is offscreen rendering per step
(`mj_envs_vision/hand_manipulation_suite/headless_observer.py:34-52`,
GL at 640x480 -> crop -> resize).  Ours is the batched analytic
ray-caster (`render/raster.py`) at 128^2 -> 64^2.  This measures, per
batch size:

  render-only   ms per frame batch (the raster.render + resize chain)
  pixel-step    full pixel env step (physics + render), env-steps/s
  cnn-act       pixel PPO actor forward on the rendered batch, ms

    SIZES=256,1024 STEPS=5 python tools/bench_vision.py

Prints one JSON line per batch size (BENCH-style) for BASELINE.md.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from mj_envs_tpu import envs
from mj_envs_tpu.envs.pixels import PixelObservationEnv

SIZES = [int(s) for s in os.environ.get("SIZES", "256,1024").split(",")]
STEPS = int(os.environ.get("STEPS", "5"))
TASK = os.environ.get("TASK", "hammer-v0")
REPS = int(os.environ.get("REPS", "3"))


def timed(fn, *args):
    out = fn(*args)
    jax.block_until_ready(jax.tree.leaves(out)[0])
    best = np.inf
    for _ in range(REPS):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(jax.tree.leaves(out)[0])
        best = min(best, time.perf_counter() - t0)
    return best, out


def main():
    env = envs.make(TASK)
    penv = PixelObservationEnv(env)
    print(f"backend={jax.default_backend()} task={TASK}", flush=True)

    from mj_envs_tpu.parallel.vector import chunked_vmap
    # Pixel chunk: the renderer materializes (B, G, H, W, 3) per-group
    # intermediates (~16 GB at B=1024) — chunk the pixel step at 256.
    PCHUNK = int(os.environ.get("PIXEL_CHUNK", "256"))

    for B in SIZES:
      try:
        key = jax.random.PRNGKey(0)
        st = jax.jit(jax.vmap(env.reset))(jax.random.split(key, B))

        # Renderer only (amortized over STEPS inside one program).
        v_render = chunked_vmap(penv._render, PCHUNK)

        def render_many(state):
            def body(acc, _):
                img = v_render(state)
                return acc + img.mean(), ()
            acc, _ = jax.lax.scan(
                body, jnp.zeros((), jnp.float32), (), length=STEPS)
            return acc
        rm_j = jax.jit(render_many)
        t, _ = timed(rm_j, st)
        render_ms = t / STEPS * 1e3

        trace_dir = os.environ.get("TRACE")
        if trace_dir:
            import importlib.util as _ilu
            spec = _ilu.spec_from_file_location(
                "profile_rollout", os.path.join(
                    os.path.dirname(os.path.abspath(__file__)),
                    "profile_rollout.py"))
            pr = _ilu.module_from_spec(spec)
            spec.loader.exec_module(pr)
            hlo = ""
            try:
                hlo = rm_j.lower(st).compile().as_text()
            except Exception as e:
                print(f"hlo fetch failed: {e}", flush=True)
            with jax.profiler.trace(trace_dir):
                out = rm_j(st)
                jax.block_until_ready(out)
            pr.parse_trace(trace_dir, hlo)

        # Full pixel rollout: physics step + render per iter.
        v_pstep = chunked_vmap(penv.step, PCHUNK)
        pst = jax.jit(jax.vmap(penv.reset))(jax.random.split(key, B))

        def rollout(pst, k):
            def body(carry, _):
                p, kk = carry
                kk, ka = jax.random.split(kk)
                a = jax.random.uniform(ka, (B, env.nu), jnp.float32,
                                       -1.0, 1.0)
                return (v_pstep(p, a), kk), ()
            (p, kk), _ = jax.lax.scan(body, (pst, k), (), length=STEPS)
            return p
        # No donation: `timed` re-invokes with the same input state.
        t, pst2 = timed(jax.jit(rollout), pst, key)
        steps_per_s = B * STEPS / t

        # CNN actor forward on the rendered pixel batch (pixel PPO act).
        cnn_ms = float("nan")
        try:
            from mj_envs_tpu.algos.networks import (
                cnn_actor_critic_init, cnn_actor_critic_apply)
            params = cnn_actor_critic_init(jax.random.PRNGKey(1), env.nu)
            t, _ = timed(jax.jit(cnn_actor_critic_apply), params,
                         pst2.pixels)
            cnn_ms = t * 1e3
        except Exception as e:
            print(f"cnn-act skipped: {e}", flush=True)

        print(json.dumps({
            "metric": f"{TASK} pixel env-steps/s @ {B} envs "
                      f"({jax.default_backend()})",
            "value": round(steps_per_s, 1),
            "unit": "env-steps/s",
            "render_ms_per_batch": round(render_ms, 3),
            "render_us_per_frame": round(render_ms / B * 1e3, 2),
            "cnn_act_ms": round(cnn_ms, 3) if cnn_ms == cnn_ms else None,
        }), flush=True)
      except Exception as e:
        print(f"size {B} failed: {type(e).__name__}: {str(e)[:300]}",
              flush=True)


if __name__ == "__main__":
    main()
