"""Hardware validation of the Pallas TPU kernels (`physics/kernels.py`).

The interpret-mode equivalence tests (`tests/test_kernels.py`) prove the
kernel *logic*; this tool proves the Mosaic-lowered kernels on the REAL
backend: noslip Gauss-Seidel sweep, Newton exact linesearch, batched SPD
Cholesky solve — each against its op-exact scan/dense reference at
physics-realistic shapes (B=1024 envs, nv=33/ncon rows as in hammer-v0).

    python tools/tpu_kernel_check.py          # uses the default backend

Prints one PASS/FAIL line per kernel plus max abs error; exits non-zero
on any failure.  Run on CPU it exercises the custom_vmap fallback paths
instead (still a valid smoke).
"""
import os
import sys

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


def main() -> int:
    print("backend:", jax.default_backend(), flush=True)
    B = int(os.environ.get("KC_BATCH", 1024))
    ok = True

    # 1. noslip sweep (R = friction rows; hammer peaks ~100+).
    args = random_noslip_problem(jax.random.PRNGKey(0), B, 118)
    want = jax.vmap(lambda *xs: KR._noslip_scan(*xs, 5))(*args)
    got = jax.jit(jax.vmap(KR.make_noslip_sweep(5)))(*args)
    ok &= _check("noslip_sweep", got, want, 5e-4)

    # 2. Newton exact linesearch (R = nefc rows).
    largs = random_linesearch_problem(jax.random.PRNGKey(1), B, 130)
    want = jax.vmap(lambda *xs: KR._linesearch_ref(*xs, 12, 16))(*largs)
    got = jax.jit(jax.vmap(KR.make_linesearch(12, 16)))(*largs)
    ok &= _check("newton_linesearch", got, want, 5e-4)

    # 3. batched SPD Cholesky solve (nv=33, hammer).
    ks = jax.random.split(jax.random.PRNGKey(2), 2)
    G = jax.random.normal(ks[0], (B, 33, 33), jnp.float32)
    H = jnp.einsum("bik,bjk->bij", G, G) / 33 \
        + 2.0 * jnp.eye(33, dtype=jnp.float32)
    g = jax.random.normal(ks[1], (B, 33), jnp.float32)
    want = jnp.linalg.solve(H, g[..., None])[..., 0]
    got = jax.jit(jax.vmap(KR.chol_solve))(H, g)
    ok &= _check("chol_solve", got, want, 2e-3)

    print("ALL KERNELS OK" if ok else "KERNEL CHECK FAILED", flush=True)
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
