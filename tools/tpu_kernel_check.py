"""Hardware validation of the TPU physics path (`physics/kernels.py` +
`physics/solver.py` + the full `pipeline.step`).

Round-2 post-mortem (VERDICT r2): the old version of this tool probed the
Pallas kernels in isolation at hand-picked shapes (noslip R=118) and
passed while the real pipeline failed to compile — hammer's actual noslip
row count is R = n_fric_dof + 3*ncmax = 129, whose (R, R, 128) AT tile
double-buffers past the default 16 MB scoped-VMEM limit at any grid > 1
(batch > 128).  This rewrite derives every shape from the BUILT MODELS of
all four tasks and drives the real code path:

  1. kernel-vs-scan equivalence at each task's true (R, nv) and B >= 256
     (grid > 1, exercising Mosaic's double-buffered pipeline);
  2. the full jitted `vmap(env.step_auto_reset)` on hammer at B >= 256,
     cross-checked block-vs-whole: lanes 0..127 stepped alone (grid = 1)
     must match the same lanes inside the B-env call (grid > 1).

    python tools/tpu_kernel_check.py            # default backend, B=256
    KC_BATCH=1024 KC_ALL=1 python tools/tpu_kernel_check.py

Prints one PASS/FAIL line per check; exits non-zero on any failure.  On
CPU it exercises the custom_vmap fallback paths instead (still a valid
smoke of the dispatch logic).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if os.environ.get("JAX_PLATFORMS", "") == "cpu":
    # CPU-only run must not dial the axon tunnel (blocks for minutes
    # when it is down) — drop the plugin before any backend init.
    from mj_envs_tpu.utils.hostcpu import pin_cpu
    pin_cpu()

import numpy as np
import jax
import jax.numpy as jnp

from mj_envs_tpu.physics import kernels as KR
from mj_envs_tpu.physics.kernels import (random_linesearch_problem,
                                         random_noslip_problem)


def _check(name, got, want, tol):
    err = float(jnp.max(jnp.abs(got - want)))
    ok = np.isfinite(err) and err <= tol
    print(f"{'PASS' if ok else 'FAIL'} {name}: max_abs_err={err:.3e} "
          f"(tol {tol:.0e})", flush=True)
    return ok


def _assert_true(name, cond, detail=""):
    print(f"{'PASS' if cond else 'FAIL'} {name} {detail}", flush=True)
    return bool(cond)


def task_shapes():
    """Derive (R_noslip, nv, nefc) from the BUILT model of each task —
    the shapes the solver actually compiles at (`pipeline.forward_core`
    computes n_fric_dof from spec.dof_hasfrictionloss and ncmax from
    `pipeline._ncmax`)."""
    from mj_envs_tpu import envs
    from mj_envs_tpu.physics import pipeline as P
    shapes = {}
    for task in ("hammer", "door", "pen", "relocate"):
        env = envs.make(f"{task}-v0")
        s = env.model.spec
        nfl = int(np.sum(s.dof_hasfrictionloss))
        ncmax = P._ncmax(s)
        R = nfl + 3 * ncmax
        shapes[task] = dict(env=env, R=R, nv=s.nv, ncmax=ncmax, nfl=nfl)
        print(f"  {task}-v0: nv={s.nv} n_fric_dof={nfl} ncmax={ncmax} "
              f"noslip_R={R}", flush=True)
    return shapes


def check_kernels(shapes, B):
    """Kernel-vs-scan equivalence at every task's REAL noslip R and at
    the real nv, with B >= 256 so the Pallas grid is > 1."""
    ok = True
    for i, (task, info) in enumerate(sorted(shapes.items())):
        R, nv = info["R"], info["nv"]
        fits = KR.noslip_pallas_fits(R)
        args = random_noslip_problem(jax.random.PRNGKey(i), B, R)
        want = jax.vmap(lambda *xs: KR._noslip_scan(*xs, 5))(*args)
        got = jax.jit(jax.vmap(KR.make_noslip_sweep(5)))(*args)
        ok &= _check(f"noslip_sweep[{task} R={R} B={B} "
                     f"pallas={fits}]", got, want, 5e-4)

        nefc = R + 3 * info["ncmax"]  # >= linesearch row count scale
        largs = random_linesearch_problem(jax.random.PRNGKey(10 + i),
                                          B, nefc)
        want = jax.vmap(lambda *xs: KR._linesearch_ref(*xs, 12, 16))(*largs)
        got = jax.jit(jax.vmap(KR.make_linesearch(12, 16)))(*largs)
        ok &= _check(f"newton_linesearch[{task} R={nefc} B={B}]",
                     got, want, 5e-4)

        ks = jax.random.split(jax.random.PRNGKey(20 + i), 2)
        G = jax.random.normal(ks[0], (B, nv, nv), jnp.float32)
        H = jnp.einsum("bik,bjk->bij", G, G) / nv \
            + 2.0 * jnp.eye(nv, dtype=jnp.float32)
        g = jax.random.normal(ks[1], (B, nv), jnp.float32)
        want = jnp.linalg.solve(H, g[..., None])[..., 0]
        got = jax.jit(jax.vmap(KR.chol_solve))(H, g)
        ok &= _check(f"chol_solve[{task} nv={nv} B={B}]", got, want, 2e-3)

        # Matrix-RHS solve at the real noslip shape (X = M^-1 D^T).
        rhs = jax.random.normal(ks[1], (B, nv, R), jnp.float32)
        want = jnp.linalg.solve(H, rhs)
        got = jax.jit(jax.vmap(KR.chol_solve_mat))(H, rhs)
        ok &= _check(f"chol_solve_mat[{task} nv={nv} R={R} B={B}]",
                     got, want, 2e-3)
    return ok


def check_pipeline(shapes, B, tasks):
    """The real thing: jit vmap(env.step_auto_reset) at B (grid > 1)
    with random actions, assert finiteness, and check lanes 0..127 match
    a separate grid=1 call on the same states/actions."""
    ok = True
    for task in tasks:
        env = shapes[task]["env"]
        t0 = time.time()
        reset = jax.jit(jax.vmap(env.reset))
        vstep = jax.jit(jax.vmap(env.step_auto_reset))
        state = reset(jax.random.split(jax.random.PRNGKey(0), B))
        key = jax.random.PRNGKey(1)
        for _ in range(3):
            key, ka = jax.random.split(key)
            a = jax.random.uniform(ka, (B, env.nu), jnp.float32, -1., 1.)
            state = vstep(state, a)
        jax.block_until_ready(state.obs)
        finite = bool(jnp.all(jnp.isfinite(state.obs))
                      & jnp.all(jnp.isfinite(state.data.qpos)))
        ok &= _assert_true(
            f"pipeline_step[{task} B={B}]", finite,
            f"(3 steps, {time.time() - t0:.0f}s incl. compile)")

        # Block-consistency: the same 128 lanes stepped alone (grid=1).
        sub = jax.tree.map(lambda x: x[:128], state)
        key, ka = jax.random.split(key)
        a = jax.random.uniform(ka, (B, env.nu), jnp.float32, -1., 1.)
        whole = vstep(state, a)
        part = jax.jit(jax.vmap(env.step_auto_reset))(sub, a[:128])
        # NaN quarantine resets use per-env RNG folded identically in
        # both calls, so qpos must agree bitwise modulo f32 reduction
        # order; allow tiny slack.
        err = float(jnp.max(jnp.abs(whole.data.qpos[:128]
                                    - part.data.qpos)))
        ok &= _check(f"pipeline_block_consistency[{task}]",
                     whole.data.qpos[:128], part.data.qpos, 1e-5)
    return ok


def main() -> int:
    print("backend:", jax.default_backend(), flush=True)
    B = max(256, int(os.environ.get("KC_BATCH", 256)))
    print("deriving shapes from built models:", flush=True)
    shapes = task_shapes()
    ok = check_kernels(shapes, B)
    e2e_tasks = list(shapes) if os.environ.get("KC_ALL") else ["hammer"]
    ok &= check_pipeline(shapes, B, e2e_tasks)
    print("ALL KERNELS OK" if ok else "KERNEL CHECK FAILED", flush=True)
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
