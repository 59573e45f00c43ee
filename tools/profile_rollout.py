"""Profile the fused 20-step rollout program (the bench shape) at batch B.

The bench gap is rollout-PROGRAM behavior, not the substep: the substep
is batch-linear (~8.5 us/env at 1024 and 4096) while the fused rollout
runs 6.6 us/env at 1024 vs 9.4 at 4096 (round-4 VERDICT).  This tool
brackets where the difference lives by timing nested variants of the
rollout, each as ONE jitted scan program (dispatch amortized away):

  substeps   scan of pipeline.step only (frame_skip per iter)
  env.step   + obs/reward/termination
  full       + auto-reset + on-device action sampling  (= bench program)

    NUM_ENVS=4096 STEPS=20 python tools/profile_rollout.py

TRACE=/tmp/tr dumps a jax.profiler trace of the full rollout and prints
the top device ops aggregated by name, mapped to source lines via the
compiled HLO text (the round-4 attribution recipe; compile happens on
the tunnel server so --xla_dump_to is useless client-side).
"""
import glob
import gzip
import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from mj_envs_tpu import envs
from mj_envs_tpu.physics import pipeline

NUM_ENVS = int(os.environ.get("NUM_ENVS", "4096"))
STEPS = int(os.environ.get("STEPS", "20"))
TASK = os.environ.get("TASK", "hammer")
REPS = int(os.environ.get("REPS", "3"))
VARIANTS = os.environ.get("VARIANTS", "substeps,envstep,full").split(",")


def time_rollout(name, fn, state, key, n_steps):
    fn_j = jax.jit(fn, donate_argnums=(0,))
    # Donation consumes the input buffers — keep the caller's state
    # reusable across variants.
    state = jax.tree.map(jnp.copy, state)
    state2, _ = fn_j(state, key)
    jax.block_until_ready(jax.tree.leaves(state2)[0])
    best = np.inf
    st = state2
    for _ in range(REPS):
        t0 = time.perf_counter()
        st, _ = fn_j(st, key)
        jax.block_until_ready(jax.tree.leaves(st)[0])
        best = min(best, time.perf_counter() - t0)
    per_env_step = best / (NUM_ENVS * n_steps)
    print(f"{name:12s} {best * 1e3:9.2f} ms/call  "
          f"{per_env_step * 1e6:7.2f} us/env-step  "
          f"{NUM_ENVS * n_steps / best:10.0f} env-steps/s", flush=True)
    return fn_j, st


def parse_trace(trace_dir, hlo_text):
    """Aggregate device-op durations from the trace json, attach HLO
    source lines."""
    src_of = {}
    if hlo_text:
        pat = re.compile(
            r"%?([\w.\-]+) = .*?metadata={[^}]*?source_file=\"([^\"]+)\""
            r"[^}]*?source_line=(\d+)")
        for mm in pat.finditer(hlo_text):
            src_of[mm.group(1)] = f"{os.path.basename(mm.group(2))}:" \
                                  f"{mm.group(3)}"
    files = sorted(glob.glob(os.path.join(
        trace_dir, "plugins/profile/*/*.trace.json.gz")))
    if not files:
        print("no trace file found", flush=True)
        return
    with gzip.open(files[-1], "rt") as f:
        tr = json.load(f)
    # Keep only TPU/device-lane complete events.
    pid_names = {}
    for ev in tr.get("traceEvents", []):
        if ev.get("ph") == "M" and ev.get("name") == "process_name":
            pid_names[ev["pid"]] = ev["args"].get("name", "")
    agg = {}
    for ev in tr.get("traceEvents", []):
        if ev.get("ph") != "X":
            continue
        pname = pid_names.get(ev.get("pid"), "")
        if "TPU" not in pname and "tpu" not in pname:
            continue
        name = ev.get("name", "?")
        dur = ev.get("dur", 0)
        a = agg.setdefault(name, [0.0, 0])
        a[0] += dur
        a[1] += 1
    total = sum(v[0] for v in agg.values())
    print(f"\ndevice total {total/1e3:.2f} ms across "
          f"{sum(v[1] for v in agg.values())} events "
          f"({len(agg)} distinct ops); top 40:")
    for name, (dur, cnt) in sorted(agg.items(),
                                   key=lambda kv: -kv[1][0])[:40]:
        base = name.split("(")[0]
        src = src_of.get(base, src_of.get(base.lstrip("%"), ""))
        print(f"  {dur/1e3:9.3f} ms  x{cnt:5d}  {name[:60]:60s} {src}")


def main():
    env = envs.make(f"{TASK}-v0")
    m = env.model
    print(f"backend={jax.default_backend()} envs={NUM_ENVS} "
          f"steps={STEPS} task={TASK}", flush=True)
    key = jax.random.PRNGKey(0)
    state = jax.jit(jax.vmap(env.reset))(jax.random.split(key, NUM_ENVS))
    jax.block_until_ready(state.obs)

    v_step = jax.vmap(env.step)
    v_sar = jax.vmap(env.step_auto_reset)

    from mj_envs_tpu.envs.base import _apply_var

    def _psub(d, var, c):
        return pipeline.step(_apply_var(m, var), d, c)

    pstep = jax.vmap(_psub, in_axes=(0, 0, 0))

    def roll_substeps(state, k):
        # FRAME_SKIP pipeline substeps per iter, no obs/reward (model
        # variation applied, matching the real step path).
        def body(carry, _):
            d = carry
            c = jnp.zeros((NUM_ENVS, env.nu), d.qpos.dtype)
            for _ in range(env.FRAME_SKIP):
                d = pstep(d, state.var, c)
            return d, ()
        d, _ = jax.lax.scan(body, state.data, (), length=STEPS)
        return state.replace(data=d), ()

    def roll_envstep(state, k):
        def body(st, _):
            a = jnp.zeros((NUM_ENVS, env.nu), st.data.qpos.dtype)
            return v_step(st, a), ()
        st, _ = jax.lax.scan(body, state, (), length=STEPS)
        return st, ()

    def roll_full(state, k):
        # The bench program: sampled actions + step_auto_reset.
        def body(carry, _):
            st, kk = carry
            kk, ka = jax.random.split(kk)
            a = jax.random.uniform(ka, (NUM_ENVS, env.nu), jnp.float32,
                                   -1.0, 1.0)
            return (v_sar(st, a), kk), ()
        (st, kk), _ = jax.lax.scan(body, (state, k), (), length=STEPS)
        return st, ()

    def roll_envstep_rand(state, k):
        # envstep + on-device action sampling (isolates RNG cost).
        def body(carry, _):
            st, kk = carry
            kk, ka = jax.random.split(kk)
            a = jax.random.uniform(ka, (NUM_ENVS, env.nu), jnp.float32,
                                   -1.0, 1.0)
            return (v_step(st, a), kk), ()
        (st, kk), _ = jax.lax.scan(body, (state, k), (), length=STEPS)
        return st, ()

    def _sar_nofresh(st0, action):
        # step_auto_reset with fresh := post-step state (measures the
        # finite-checks + merge WITHOUT the reset computation).
        st = env.step(st0, action)
        finite = (jnp.all(jnp.isfinite(st.data.qpos))
                  & jnp.all(jnp.isfinite(st.data.qvel))
                  & jnp.all(jnp.isfinite(st.obs)))
        trunc = st.step_count >= env.MAX_EPISODE_STEPS
        restart = st.done | trunc | ~finite
        fresh = st
        merged = jax.tree_util.tree_map(
            lambda a, b: jnp.where(restart, a, b), fresh, st)
        return merged.replace(done=restart)

    def roll_nofresh(state, k):
        v = jax.vmap(_sar_nofresh)
        def body(carry, _):
            st, kk = carry
            kk, ka = jax.random.split(kk)
            a = jax.random.uniform(ka, (NUM_ENVS, env.nu), jnp.float32,
                                   -1.0, 1.0)
            return (v(st, a), kk), ()
        (st, kk), _ = jax.lax.scan(body, (state, k), (), length=STEPS)
        return st, ()

    def _sar_nomerge(st0, action):
        # step + full reset computation but NO merge (measures the
        # reset-path cost itself).
        st = env.step(st0, action)
        fresh = env.reset(st.key)
        # 1e-30 (not 0.0) so XLA cannot dead-code the reset computation.
        return st.replace(reward=st.reward + 1e-30 * (
            fresh.reward + fresh.obs.sum() + fresh.data.qpos.sum()))

    def roll_nomerge(state, k):
        v = jax.vmap(_sar_nomerge)
        def body(carry, _):
            st, kk = carry
            kk, ka = jax.random.split(kk)
            a = jax.random.uniform(ka, (NUM_ENVS, env.nu), jnp.float32,
                                   -1.0, 1.0)
            return (v(st, a), kk), ()
        (st, kk), _ = jax.lax.scan(body, (state, k), (), length=STEPS)
        return st, ()

    CHUNK = int(os.environ.get("CHUNK", "1024"))

    def roll_full_chunked(state, k):
        # The bench program, but each scan iteration maps over K
        # sequential chunks of CHUNK envs: every data-dependent
        # while_loop (Newton early exit, narrowphase loops) converges
        # per-chunk instead of across the whole batch, so one hard env
        # stalls CHUNK envs, not NUM_ENVS.
        K = NUM_ENVS // CHUNK
        assert K * CHUNK == NUM_ENVS

        def body(carry, _):
            st, kk = carry
            kk, ka = jax.random.split(kk)
            a = jax.random.uniform(ka, (NUM_ENVS, env.nu), jnp.float32,
                                   -1.0, 1.0)
            stc = jax.tree.map(
                lambda x: x.reshape((K, CHUNK) + x.shape[1:]), st)
            ac = a.reshape(K, CHUNK, env.nu)
            stc = jax.lax.map(lambda args: v_sar(*args), (stc, ac))
            st = jax.tree.map(
                lambda x: x.reshape((NUM_ENVS,) + x.shape[2:]), stc)
            return (st, kk), ()
        (st, kk), _ = jax.lax.scan(body, (state, k), (), length=STEPS)
        return st, ()

    named = {"substeps": roll_substeps, "envstep": roll_envstep,
             "envstep_rand": roll_envstep_rand, "nofresh": roll_nofresh,
             "nomerge": roll_nomerge, "full": roll_full,
             "chunked": roll_full_chunked}
    traced_j, traced_fn, last_state = None, None, state
    for v in VARIANTS:
        fn_j, last_state = time_rollout(
            v, named[v], state, key, STEPS)
        traced_j, traced_fn = fn_j, named[v]

    # Trace the LAST variant run.
    trace_dir = os.environ.get("TRACE")
    if trace_dir and traced_j is not None:
        hlo = ""
        if os.environ.get("HLO", "1") == "1":
            try:
                hlo = jax.jit(traced_fn, donate_argnums=(0,)).lower(
                    state, key).compile().as_text()
            except Exception as e:  # pragma: no cover
                print(f"hlo fetch failed: {e}", flush=True)
        with jax.profiler.trace(trace_dir):
            st, _ = traced_j(last_state, key)
            jax.block_until_ready(jax.tree.leaves(st)[0])
        parse_trace(trace_dir, hlo)


if __name__ == "__main__":
    main()
