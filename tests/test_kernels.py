"""Pallas kernel equivalence tests (CPU interpret mode).

The TPU noslip sweep kernel (`physics/kernels.py`) must produce the SAME
update sequence as the `lax.scan` reference implementation it replaces
(`solver.noslip`'s f64/CPU path) — Gauss-Seidel is order-sensitive, so
elementwise f32 agreement is the contract.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mj_envs_tpu.physics import kernels as KR
# shared with tools/tpu_kernel_check.py: the hardware check exercises
# exactly the distributions these interpret-mode tests validate
from mj_envs_tpu.physics.kernels import (random_linesearch_problem as
                                         _random_ls_problem,
                                         random_noslip_problem as
                                         _random_problem)


@pytest.mark.parametrize("B,R,iters", [(3, 7, 4), (65, 16, 3), (2, 118, 2)])
def test_noslip_pallas_matches_scan(B, R, iters):
    """Interpret-mode Pallas kernel vs per-env scan, elementwise."""
    args = _random_problem(jax.random.PRNGKey(0), B, R)
    want = jax.vmap(lambda *xs: KR._noslip_scan(*xs, iters))(*args)
    KR._INTERPRET = True
    try:
        got = KR._noslip_pallas(*args, iters)
    finally:
        KR._INTERPRET = False
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_noslip_custom_vmap_dispatch():
    """make_noslip_sweep: unbatched call runs the scan; vmapped call on a
    non-TPU backend falls back to vmapped scan (same numbers)."""
    iters = 3
    sweep = KR.make_noslip_sweep(iters)
    args = _random_problem(jax.random.PRNGKey(1), 4, 9)
    single = [x[0] for x in args]
    want1 = KR._noslip_scan(*single, iters)
    got1 = sweep(*single)
    np.testing.assert_allclose(np.asarray(got1), np.asarray(want1),
                               rtol=1e-6, atol=1e-6)

    wantB = jax.vmap(lambda *xs: KR._noslip_scan(*xs, iters))(*args)
    gotB = jax.jit(jax.vmap(sweep))(*args)
    np.testing.assert_allclose(np.asarray(gotB), np.asarray(wantB),
                               rtol=1e-6, atol=1e-6)


def test_noslip_sweep_cached_reuses():
    assert KR.noslip_sweep_cached(5) is KR.noslip_sweep_cached(5)
    assert KR.noslip_sweep_cached(5) is not KR.noslip_sweep_cached(6)


@pytest.mark.parametrize("B,R", [(3, 7), (130, 37), (64, 118)])
def test_linesearch_pallas_matches_ref(B, R):
    args = _random_ls_problem(jax.random.PRNGKey(0), B, R)
    want = jax.vmap(lambda *xs: KR._linesearch_ref(*xs, 12, 16))(*args)
    KR._INTERPRET = True
    try:
        got = KR._linesearch_pallas(*args, 12, 16)
    finally:
        KR._INTERPRET = False
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-6)


def test_linesearch_custom_vmap_dispatch():
    search = KR.make_linesearch(12, 16)
    args = _random_ls_problem(jax.random.PRNGKey(1), 4, 9)
    single = [x[0] for x in args]
    want1 = KR._linesearch_ref(*single, 12, 16)
    got1 = search(*single)
    np.testing.assert_allclose(np.asarray(got1), np.asarray(want1),
                               rtol=1e-6)
    wantB = jax.vmap(lambda *xs: KR._linesearch_ref(*xs, 12, 16))(*args)
    gotB = jax.jit(jax.vmap(search))(*args)
    np.testing.assert_allclose(np.asarray(gotB), np.asarray(wantB),
                               rtol=1e-6)


@pytest.mark.parametrize("B,nv", [(2, 5), (130, 33), (64, 36)])
def test_chol_solve_pallas_matches_dense(B, nv):
    ks = jax.random.split(jax.random.PRNGKey(2), 2)
    G = jax.random.normal(ks[0], (B, nv, nv), jnp.float32)
    H = jnp.einsum("bik,bjk->bij", G, G) / nv \
        + 2.0 * jnp.eye(nv, dtype=jnp.float32)
    g = jax.random.normal(ks[1], (B, nv), jnp.float32)
    want = jnp.linalg.solve(H, g[..., None])[..., 0]
    KR._INTERPRET = True
    try:
        got = KR._chol_solve_pallas(H, g)
    finally:
        KR._INTERPRET = False
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-5)


@pytest.mark.parametrize("B,nv,R", [(2, 5, 3), (130, 33, 129), (64, 36, 17)])
def test_chol_solve_mat_pallas_matches_dense(B, nv, R):
    ks = jax.random.split(jax.random.PRNGKey(4), 2)
    G = jax.random.normal(ks[0], (B, nv, nv), jnp.float32)
    H = jnp.einsum("bik,bjk->bij", G, G) / nv \
        + 2.0 * jnp.eye(nv, dtype=jnp.float32)
    rhs = jax.random.normal(ks[1], (B, nv, R), jnp.float32)
    want = jnp.linalg.solve(H, rhs)
    KR._INTERPRET = True
    try:
        got = KR._chol_solve_mat_pallas(H, rhs)
    finally:
        KR._INTERPRET = False
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


def test_chol_solve_mat_custom_vmap_dispatch():
    ks = jax.random.split(jax.random.PRNGKey(5), 2)
    B, nv, R = 6, 8, 5
    G = jax.random.normal(ks[0], (B, nv, nv))
    H = jnp.einsum("bik,bjk->bij", G, G) / nv + 2.0 * jnp.eye(nv)
    rhs = jax.random.normal(ks[1], (B, nv, R))
    want = jnp.linalg.solve(H, rhs)
    got1 = KR.chol_solve_mat(H[0], rhs[0])          # unbatched path
    np.testing.assert_allclose(np.asarray(got1), np.asarray(want[0]),
                               rtol=1e-6, atol=1e-9)
    gotB = jax.jit(jax.vmap(KR.chol_solve_mat))(H, rhs)   # CPU fallback
    np.testing.assert_allclose(np.asarray(gotB), np.asarray(want),
                               rtol=1e-6, atol=1e-9)


def test_chol_solve_custom_vmap_dispatch():
    ks = jax.random.split(jax.random.PRNGKey(3), 2)
    B, nv = 6, 8
    G = jax.random.normal(ks[0], (B, nv, nv))
    H = jnp.einsum("bik,bjk->bij", G, G) / nv + 2.0 * jnp.eye(nv)
    g = jax.random.normal(ks[1], (B, nv))
    want = jnp.linalg.solve(H, g[..., None])[..., 0]
    got1 = KR.chol_solve(H[0], g[0])          # unbatched path
    np.testing.assert_allclose(np.asarray(got1), np.asarray(want[0]),
                               rtol=1e-6, atol=1e-9)
    gotB = jax.jit(jax.vmap(KR.chol_solve))(H, g)   # CPU fallback path
    np.testing.assert_allclose(np.asarray(gotB), np.asarray(want),
                               rtol=1e-6, atol=1e-9)


@pytest.mark.parametrize("B,nv,R", [(5, 6, 9), (130, 33, 129)])
def test_chol_factor_reuse_matches_dense(B, nv, R):
    """chol_solve_factor + chol_solve_mat_fac (the reused-mass-matrix
    path noslip takes on TPU) vs dense solves, interpret mode."""
    key = jax.random.PRNGKey(5)
    G = jax.random.normal(key, (B, nv, nv), jnp.float32)
    H = jnp.einsum("bik,bjk->bij", G, G) \
        + nv * jnp.eye(nv, dtype=jnp.float32)[None]
    g = jax.random.normal(jax.random.PRNGKey(6), (B, nv), jnp.float32)
    rhs = jax.random.normal(jax.random.PRNGKey(7), (B, nv, R),
                            jnp.float32)
    KR._INTERPRET = True
    import mj_envs_tpu.physics.kernels as KR2
    try:
        Lt_bm = KR.chol_factor_bm(H)
        x = KR._chol_solve_mat_fac_pallas(Lt_bm, g[..., None])[..., 0]
        X = KR._chol_solve_mat_fac_pallas(Lt_bm, rhs)
    finally:
        KR._INTERPRET = False
    want_x = jnp.linalg.solve(H, g[..., None])[..., 0]
    want_X = jnp.linalg.solve(H, rhs)
    np.testing.assert_allclose(np.asarray(x), np.asarray(want_x),
                               rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(X), np.asarray(want_X),
                               rtol=2e-3, atol=2e-3)


def test_chol_factor_custom_vmap_dispatch():
    """Unbatched and CPU-vmapped paths of chol_solve_factor /
    chol_solve_mat_fac agree with plain dense solves."""
    key = jax.random.PRNGKey(8)
    B, nv, R = 4, 7, 5
    G = jax.random.normal(key, (B, nv, nv), jnp.float32)
    H = jnp.einsum("bik,bjk->bij", G, G) \
        + nv * jnp.eye(nv, dtype=jnp.float32)[None]
    g = jax.random.normal(jax.random.PRNGKey(9), (B, nv), jnp.float32)
    rhs = jax.random.normal(jax.random.PRNGKey(10), (B, nv, R),
                            jnp.float32)
    # unbatched
    x1, fac1 = KR.chol_solve_factor(H[0], g[0])
    X1 = KR.chol_solve_mat_fac(fac1, rhs[0])
    np.testing.assert_allclose(np.asarray(x1),
                               np.asarray(jnp.linalg.solve(H[0], g[0])),
                               rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(
        np.asarray(X1), np.asarray(jnp.linalg.solve(H[0], rhs[0])),
        rtol=2e-3, atol=2e-3)
    # vmapped (CPU fallback path)
    xB, facB = jax.jit(jax.vmap(KR.chol_solve_factor))(H, g)
    XB = jax.jit(jax.vmap(KR.chol_solve_mat_fac))(facB, rhs)
    np.testing.assert_allclose(np.asarray(xB),
                               np.asarray(jnp.linalg.solve(
                                   H, g[..., None])[..., 0]),
                               rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(XB),
                               np.asarray(jnp.linalg.solve(H, rhs)),
                               rtol=2e-3, atol=2e-3)


def test_make_rows_fast_matches_ref_on_env_states():
    """ADVICE r4 item 2: the f32 gather-free constraint-row assembly
    (`_make_rows_fast`) vs the historical reference (`_make_rows_ref`)
    on REAL env states with live contacts — previously the fast path
    was only exercised by TPU-gated e2e tests, so a divergence in the
    pair-table packing or facet masking could ship unnoticed on CPU."""
    from mj_envs_tpu import envs
    from mj_envs_tpu.physics import constraint as CN
    from mj_envs_tpu.physics import kinematics as K
    from mj_envs_tpu.physics import pipeline as P
    from mj_envs_tpu.physics.collision import driver as C

    env = envs.make("hammer-v0")
    m = env.model
    ncmax = P._ncmax(m.spec)
    st = jax.jit(env.reset)(jax.random.PRNGKey(5))
    step = jax.jit(env.step)
    rng = np.random.default_rng(5)

    checked_contacts = 0
    for t in range(12):
        a = jnp.asarray(rng.uniform(-1, 1, env.nu), jnp.float32)
        st = step(st, a)
        qpos = st.data.qpos
        qvel = st.data.qvel
        kin = K.kinematics(m, qpos)
        _, cc = C.collide(m, kin, ncmax)
        fast = CN._make_rows_fast(m, kin, qpos, qvel, cc)
        ref = CN._make_rows_ref(m, kin, qpos, qvel, cc)
        checked_contacts += int(np.sum(np.asarray(cc.active)))
        act = np.asarray(ref.active)
        assert np.array_equal(np.asarray(fast.active), act), t
        assert np.array_equal(np.asarray(fast.oneside),
                              np.asarray(ref.oneside)), t
        for name in ("J", "aref", "D", "R", "floss", "pos"):
            a_f = np.asarray(CN.expand_J(fast) if name == "J"
                             else getattr(fast, name))
            a_r = np.asarray(getattr(ref, name))
            # Inactive rows: fast pre-masks, ref post-masks — compare
            # only where a row exists (D/R are active-masked already).
            if name in ("J", "aref", "pos"):
                mask = act if a_f.ndim == 1 else act[:, None]
                a_f = np.where(mask, a_f, 0.0)
                a_r = np.where(mask, a_r, 0.0)
            np.testing.assert_allclose(
                a_f, a_r, rtol=2e-5, atol=1e-6,
                err_msg=f"step {t} field {name}")
    assert checked_contacts >= 10, "trajectory never made contact"


def test_fk_parallel_matches_ref():
    """Pointer-doubling FK (`_kinematics_parallel`) vs the sequential
    reference on all four tasks at perturbed states (f32).  The parallel
    form re-associates the chain composition, so agreement is at f32
    roundoff, not bitwise."""
    from mj_envs_tpu import envs
    from mj_envs_tpu.physics import kinematics as K

    for task in ("hammer-v0", "door-v0", "pen-v0", "relocate-v0"):
        env = envs.make(task)
        m = env.model
        rng = np.random.default_rng(3)
        qpos = jnp.asarray(
            np.asarray(m.qpos0)[None]
            + 0.3 * rng.standard_normal((8, m.spec.nq)), jnp.float32)
        ref = jax.jit(jax.vmap(K._kinematics_ref,
                               in_axes=(None, 0)))(m, qpos)
        par = jax.jit(jax.vmap(K._kinematics_parallel,
                               in_axes=(None, 0)))(m, qpos)
        for f in K.Kin._fields:
            a = np.asarray(getattr(ref, f))
            b = np.asarray(getattr(par, f))
            scale = max(1.0, float(np.max(np.abs(a))) if a.size else 1.0)
            assert np.max(np.abs(a - b)) <= 2e-5 * scale, (task, f)
