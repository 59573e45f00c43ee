"""Pallas TPU kernels for the constraint-solver hot loops.

The noslip post-pass is a Gauss-Seidel sweep: `iterations x R` strictly
sequential rank-1 updates.  As XLA `scan` ops over (B, R) arrays each
row update costs one loop-dispatch (~5-8 us) — 2600 iterations made
noslip ~18 ms of the 71 ms substep at 1024 envs.  Inside one Pallas
kernel the same loop runs entirely out of VMEM in batch-minor layout
(lanes = envs), taking the per-iteration cost to the VPU-instruction
scale.

Math is IDENTICAL to the `jax.lax.scan` reference implementation in
`solver.noslip` (same update order, same clamping); the f64 CPU parity
path keeps the scan implementation, and `tests/test_kernels.py` checks
kernel-vs-scan equivalence elementwise in f32.
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax import custom_batching

_INTERPRET = False   # flipped by tests to run kernels on CPU


def _noslip_scan(A, a_safe, lo, hi, gate, r0, u0, iters: int):
    """Reference sweep on ONE env: A (R, R) with A[:,k] the update
    column; returns u after `iters` Gauss-Seidel sweeps."""
    R = r0.shape[0]

    def row_update(carry, k):
        r, u = carry
        du = -r[k] / a_safe[k]
        u_new = jnp.clip(u[k] + du, lo[k], hi[k])
        du_act = jnp.where(gate[k] > 0, u_new - u[k], 0.0)
        r = r + A[:, k] * du_act
        u = u.at[k].add(du_act)
        return (r, u), None

    def sweep(carry, _):
        carry, _ = jax.lax.scan(row_update, carry, jnp.arange(R))
        return carry, None

    (r, u), _ = jax.lax.scan(sweep, (r0, u0), None, length=iters)
    return u


def _noslip_kernel(AT_ref, a_ref, lo_ref, hi_ref, gate_ref, r0_ref,
                   u0_ref, u_out_ref, r_scr, u_scr, *, R: int, iters: int,
                   tol: float = 0.0):
    r_scr[:] = r0_ref[:]
    u_scr[:] = u0_ref[:]

    def _row_update(k):
        import jax.numpy as jnp  # noqa: F811 (clarity inside kernel)
        from jax.experimental import pallas as pl
        rk = r_scr[pl.ds(k, 1), :]                   # (1, B)
        ak = a_ref[pl.ds(k, 1), :]
        uk = u_scr[pl.ds(k, 1), :]
        du = -rk / ak
        u_new = jnp.clip(uk + du, lo_ref[pl.ds(k, 1), :],
                         hi_ref[pl.ds(k, 1), :])
        du_act = jnp.where(gate_ref[pl.ds(k, 1), :] > 0.0,
                           u_new - uk, 0.0)
        r_scr[:] = r_scr[:] + AT_ref[k] * du_act     # (R, B) += (R,B)*(1,B)
        u_scr[pl.ds(k, 1), :] = uk + du_act
        return du_act

    if tol == 0.0:
        # Exact legacy codegen: fixed trip count, no convergence
        # bookkeeping (the CPU scan reference runs the same count —
        # kernel-equality tests rely on this branch).
        def row(k, carry):
            _row_update(k)
            return carry

        def sweep(s, carry):
            return jax.lax.fori_loop(0, R, row, carry)

        jax.lax.fori_loop(0, iters, sweep, 0)
    else:
        # Early exit once a full sweep's largest force update drops
        # below tol * (force scale): mujoco's mj_solNoSlip likewise
        # stops on a tolerance (mjOption.noslip_tolerance), not always
        # on maxiter.  The per-row cost is ONE elementwise max on the
        # (1, B) lane vector; the cross-lane reduction happens once per
        # sweep.  Scale = the largest box bound in this block
        # (frictionloss limits / normal-force sums).  Per-BLOCK exit:
        # one hard env stalls only its 128-lane block.
        scale = jnp.maximum(jnp.max(hi_ref[:]), 1.0)

        def row(k, mx):
            du_act = _row_update(k)
            return jnp.maximum(mx, jnp.abs(du_act))  # (1, B) elementwise

        def sweep_body(carry):
            s, _ = carry
            mxv = jax.lax.fori_loop(
                0, R, row, jnp.zeros((1, r_scr.shape[1]), AT_ref.dtype))
            return s + 1, jnp.max(mxv)

        def sweep_cond(carry):
            s, mx = carry
            return (s < iters) & (mx > tol * scale)

        jax.lax.while_loop(
            sweep_cond, sweep_body,
            (jnp.asarray(0, jnp.int32),
             jnp.asarray(jnp.inf, AT_ref.dtype)))
    u_out_ref[:] = u_scr[:]


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


# Physical VMEM is 128 MB on v5e/v6e (the 16 MB figure is Mosaic's
# conservative *default* scoped limit, not the hardware).  Leave
# headroom for Mosaic's internal scratch and semaphores.
_VMEM_BUDGET = 100 * 1024 * 1024


def _noslip_vmem_bytes(R: int, block_b: int, grid: int) -> int:
    """Scoped-VMEM estimate for `_noslip_pallas` at (R, block_b, grid).

    Mosaic pads the last two dims of each block to the f32 tile (8, 128)
    and double-buffers every grid-varying buffer when grid > 1 — at
    hammer's R=129 the (R, R, 128) AT tile alone is ~8.5 MB, so the
    double-buffered pipeline exceeds the 16 MB *default* scoped limit
    (the round-2 regression, VERDICT r2 item 1).  We size the limit from
    this estimate instead of accepting the default.
    """
    itemsize = 4
    lanes = _round_up(block_b, 128)
    mat = R * _round_up(R, 8) * lanes * itemsize          # AT block
    vec = _round_up(R, 8) * lanes * itemsize              # (R, B) block
    bufs = mat + 7 * vec                                  # 6 in + 1 out
    if grid > 1:
        bufs *= 2                                         # double buffering
    return bufs + 2 * vec                                 # scratch


def noslip_pallas_fits(R: int, block_b: int = 128) -> bool:
    """Whether the Pallas noslip kernel fits VMEM at this row count."""
    return _noslip_vmem_bytes(R, block_b, grid=2) + (2 << 20) <= _VMEM_BUDGET


def _noslip_pallas(A, a_safe, lo, hi, gate, r0, u0, iters: int,
                   block_b: int = 128, tol: float = 0.0):
    """Batched sweep on TPU: A (B, R, R) f32; returns u (B, R)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, R, _ = A.shape
    pad = (-B) % block_b
    if pad:
        padf = lambda x: jnp.pad(x, ((0, pad),) + ((0, 0),) * (x.ndim - 1))
        A, a_safe, lo, hi, gate, r0, u0 = map(
            padf, (A, a_safe, lo, hi, gate, r0, u0))
        B = B + pad

    # Batch-minor layouts: AT[k, j, b] = A[b, j, k] so the kernel's
    # per-row column fetch indexes the MAJOR dim (free); vectors (R, B).
    AT = jnp.transpose(A, (2, 1, 0))
    vecs = [jnp.transpose(x, (1, 0))
            for x in (a_safe, lo, hi, gate, r0, u0)]

    vspec = pl.BlockSpec((R, block_b), lambda g: (0, g),
                         memory_space=pltpu.VMEM)
    grid = B // block_b
    vmem_need = _noslip_vmem_bytes(R, block_b, grid) + (2 << 20)
    u_t = pl.pallas_call(
        functools.partial(_noslip_kernel, R=R, iters=iters, tol=tol),
        grid=(grid,),
        in_specs=[pl.BlockSpec((R, R, block_b), lambda g: (0, 0, g),
                               memory_space=pltpu.VMEM)] + [vspec] * 6,
        out_specs=vspec,
        out_shape=jax.ShapeDtypeStruct((R, B), A.dtype),
        scratch_shapes=[pltpu.VMEM((R, block_b), A.dtype)] * 2,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=min(vmem_need, _VMEM_BUDGET)),
        interpret=_INTERPRET,
    )(AT, *vecs)
    u = jnp.transpose(u_t, (1, 0))
    return u[: u.shape[0] - pad] if pad else u


def make_noslip_sweep(iters: int, tol: float = 0.0):
    """Returns sweep(A, a_safe, lo, hi, gate, r0, u0) with static
    iteration count, batch-aware: the unbatched form runs the scan; one
    level of vmap reroutes to the Pallas kernel on TPU f32 (scan
    fallback elsewhere).  tol > 0 enables the kernel's per-block
    early exit (TPU f32 only; scan paths always run `iters` sweeps)."""

    @custom_batching.custom_vmap
    def sweep(A, a_safe, lo, hi, gate, r0, u0):
        return _noslip_scan(A, a_safe, lo, hi, gate, r0, u0, iters)

    @sweep.def_vmap
    def sweep_vmap(axis_size, in_batched, A, a_safe, lo, hi, gate, r0, u0):
        args = [A, a_safe, lo, hi, gate, r0, u0]
        flat = []
        for x, b in zip(args, in_batched):
            flat.append(x if b else jnp.broadcast_to(
                x, (axis_size,) + x.shape))
        A, a_safe, lo, hi, gate, r0, u0 = flat
        use_pallas = (A.dtype == jnp.float32
                      and jax.default_backend() == "tpu"
                      and noslip_pallas_fits(A.shape[-1]))
        if use_pallas:
            u = _noslip_pallas(A, a_safe, lo, hi, gate, r0, u0, iters,
                               tol=tol)
        else:
            u = jax.vmap(lambda *xs: _noslip_scan(*xs, iters))(
                A, a_safe, lo, hi, gate, r0, u0)
        return u, True

    return sweep


_SWEEPS = {}


def noslip_sweep_cached(iters: int, tol: float = 0.0):
    if (iters, tol) not in _SWEEPS:
        _SWEEPS[(iters, tol)] = make_noslip_sweep(iters, tol)
    return _SWEEPS[(iters, tol)]


# ---------------------------------------------------------------------------
# Newton exact linesearch
#
# solver.newton_solve's safeguarded linesearch is 12 bracket + 16
# bisection-Newton iterations, each evaluating phi'(alpha) (and phi'')
# over all constraint rows — ~44 evaluations x ~8 element-wise ops on
# (B, R) arrays per Newton iteration.  As XLA while-loop ops each costs
# a dispatch + an HBM round-trip of the (B, R) operands; inside one
# Pallas kernel the whole search runs on VMEM-resident rows.
# ---------------------------------------------------------------------------


def _ls_phi_terms(jar_a, D, floss, active):
    """Constraint force f(jar_a) and active-quadratic mask (exactly
    solver._forces, element-wise)."""
    is_fric = floss > 0
    f_quad = -D * jar_a
    f_fric = jnp.clip(f_quad, -floss, floss)
    f_one = jnp.where(jar_a < 0, f_quad, 0.0)
    f = jnp.where(is_fric, f_fric, f_one)
    quad = jnp.where(is_fric, jnp.abs(f_quad) <= floss, jar_a < 0) & active
    return f * active, quad


def _linesearch_ref(jar, Jp, D, floss, active, c1, c2,
                    bracket_iters: int, ls_iters: int):
    """Reference linesearch on ONE env (vectors (R,)); returns alpha.
    Ops and order IDENTICAL to solver.newton_solve's inline search."""
    dtype = jar.dtype

    def dphi(alpha):
        jar_a = jar + alpha * Jp
        f_a, _ = _ls_phi_terms(jar_a, D, floss, active)
        return c1 + alpha * c2 - jnp.sum(f_a * Jp)

    def ddphi(alpha):
        jar_a = jar + alpha * Jp
        _, quad_a = _ls_phi_terms(jar_a, D, floss, active)
        return c2 + jnp.sum(jnp.where(quad_a, D, 0.0) * Jp * Jp)

    hi = jax.lax.fori_loop(
        0, bracket_iters,
        lambda _, h: jnp.where(dphi(h) < 0, h * 2.0, h),
        jnp.asarray(1.0, dtype=dtype))
    lo = jnp.asarray(0.0, dtype=dtype)

    def ls_body(_, st):
        lo, hi, alpha = st
        d1 = dphi(alpha)
        d2 = ddphi(alpha)
        lo = jnp.where(d1 < 0, alpha, lo)
        hi = jnp.where(d1 < 0, hi, alpha)
        a_newton = alpha - d1 / jnp.maximum(d2, 1e-30)
        inside = (a_newton > lo) & (a_newton < hi)
        alpha = jnp.where(inside, a_newton, 0.5 * (lo + hi))
        return (lo, hi, alpha)

    lo, hi, alpha = jax.lax.fori_loop(
        0, ls_iters, ls_body, (lo, hi, jnp.minimum(hi, 1.0)))
    return alpha


def _rows_cost_at(jar, Jp, D, floss, alpha):
    """Per-row constraint cost at jar + alpha*Jp (exactly
    solver._cost_rows before the `active` mask and sum)."""
    jar_a = jar + alpha * Jp
    is_fric = floss > 0
    quad_cost = 0.5 * D * jar_a * jar_a
    lin_cost = floss * jnp.abs(jar_a) \
        - 0.5 * floss ** 2 / jnp.maximum(D, 1e-30)
    fric_cost = jnp.where(jnp.abs(D * jar_a) <= floss, quad_cost, lin_cost)
    one_cost = jnp.where(jar_a < 0, quad_cost, 0.0)
    return jnp.where(is_fric, fric_cost, one_cost)


def _linesearch_cost_ref(jar, Jp, D, floss, active, c1, c2,
                         bracket_iters: int, ls_iters: int):
    """Linesearch + constraint-row cost at the chosen alpha (one env).
    The alpha math is identical to `_linesearch_ref`; the extra output
    saves newton_solve a separate full-row cost pass per iteration."""
    alpha = _linesearch_ref(jar, Jp, D, floss, active, c1, c2,
                            bracket_iters, ls_iters)
    af = active.astype(jar.dtype) if active.dtype == jnp.bool_ else active
    cost = jnp.sum(_rows_cost_at(jar, Jp, D, floss, alpha) * af)
    return alpha, cost


def _linesearch_alpha_vals(jar, Jp, D, floss, active, c1, c2,
                           bracket_iters: int, ls_iters: int):
    """Linesearch on VMEM-resident batch-minor values: rows (R, Bblk),
    scalars (1, Bblk).  Masks are f32 0/1 combined multiplicatively
    (Mosaic cannot materialize bool vregs); `is_fric` stays a predicate."""
    is_fric = floss > 0

    def dphi(alpha):
        jar_a = jar + alpha * Jp
        f_quad = -D * jar_a
        f_fric = jnp.clip(f_quad, -floss, floss)
        f_one = jnp.where(jar_a < 0, f_quad, 0.0)
        f = jnp.where(is_fric, f_fric, f_one) * active
        return c1 + alpha * c2 - jnp.sum(f * Jp, axis=0, keepdims=True)

    def ddphi(alpha):
        jar_a = jar + alpha * Jp
        f_quad = -D * jar_a
        quad_fric = (jnp.abs(f_quad) <= floss).astype(jar.dtype)
        quad_one = (jar_a < 0).astype(jar.dtype)
        quad = jnp.where(is_fric, quad_fric, quad_one) * active
        return c2 + jnp.sum(quad * D * Jp * Jp,
                            axis=0, keepdims=True)

    hi = jax.lax.fori_loop(
        0, bracket_iters,
        lambda _, h: jnp.where(dphi(h) < 0, h * 2.0, h),
        jnp.ones_like(c1))
    lo = jnp.zeros_like(c1)

    def ls_body(_, st):
        lo, hi, alpha = st
        d1 = dphi(alpha)
        d2 = ddphi(alpha)
        lo = jnp.where(d1 < 0, alpha, lo)
        hi = jnp.where(d1 < 0, hi, alpha)
        a_newton = alpha - d1 / jnp.maximum(d2, 1e-30)
        inside = (a_newton > lo) & (a_newton < hi)
        alpha = jnp.where(inside, a_newton, 0.5 * (lo + hi))
        return (lo, hi, alpha)

    lo, hi, alpha = jax.lax.fori_loop(
        0, ls_iters, ls_body, (lo, hi, jnp.minimum(hi, 1.0)))
    return alpha


def _linesearch_kernel(jar_ref, Jp_ref, D_ref, floss_ref, active_ref,
                       c1_ref, c2_ref, alpha_out_ref, *,
                       bracket_iters: int, ls_iters: int):
    alpha_out_ref[:] = _linesearch_alpha_vals(
        jar_ref[:], Jp_ref[:], D_ref[:], floss_ref[:], active_ref[:],
        c1_ref[:], c2_ref[:], bracket_iters, ls_iters)


def _linesearch_cost_kernel(jar_ref, Jp_ref, D_ref, floss_ref, active_ref,
                            c1_ref, c2_ref, alpha_out_ref, cost_out_ref,
                            *, bracket_iters: int, ls_iters: int):
    """Linesearch + constraint-row cost at the final alpha (the rows are
    already VMEM-resident, so the extra cost pass is a few VPU ops)."""
    jar = jar_ref[:]
    Jp = Jp_ref[:]
    D = D_ref[:]
    floss = floss_ref[:]
    active = active_ref[:]
    alpha = _linesearch_alpha_vals(jar, Jp, D, floss, active,
                                   c1_ref[:], c2_ref[:],
                                   bracket_iters, ls_iters)
    alpha_out_ref[:] = alpha
    cost = _rows_cost_at(jar, Jp, D, floss, alpha) * active
    cost_out_ref[:] = jnp.sum(cost, axis=0, keepdims=True)


def _linesearch_pallas(jar, Jp, D, floss, active, c1, c2,
                       bracket_iters: int, ls_iters: int,
                       block_b: int = 128):
    """Batched linesearch on TPU: inputs (B, R) / (B,); returns (B,)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, R = jar.shape
    pad = (-B) % block_b
    if pad:
        padf = lambda x: jnp.pad(x, ((0, pad),) + ((0, 0),) * (x.ndim - 1))
        jar, Jp, D, floss, active, c1, c2 = map(
            padf, (jar, Jp, D, floss, active, c1, c2))
        B = B + pad

    rows = [jnp.transpose(x, (1, 0))
            for x in (jar, Jp, D, floss, active.astype(jar.dtype))]
    scalars = [c1[None, :], c2[None, :]]

    rspec = pl.BlockSpec((R, block_b), lambda g: (0, g),
                         memory_space=pltpu.VMEM)
    sspec = pl.BlockSpec((1, block_b), lambda g: (0, g),
                         memory_space=pltpu.VMEM)
    alpha = pl.pallas_call(
        functools.partial(_linesearch_kernel, bracket_iters=bracket_iters,
                          ls_iters=ls_iters),
        grid=(B // block_b,),
        in_specs=[rspec] * 5 + [sspec] * 2,
        out_specs=sspec,
        out_shape=jax.ShapeDtypeStruct((1, B), jar.dtype),
        interpret=_INTERPRET,
    )(*rows, *scalars)
    out = alpha[0]
    return out[: out.shape[0] - pad] if pad else out


def make_linesearch(bracket_iters: int, ls_iters: int):
    """Batch-aware linesearch: unbatched -> the reference fori_loop
    (identical ops/order to the historical inline code, keeping f64
    parity bits); one level of vmap -> Pallas on TPU f32, vmapped
    reference elsewhere."""

    @custom_batching.custom_vmap
    def search(jar, Jp, D, floss, active, c1, c2):
        return _linesearch_ref(jar, Jp, D, floss, active, c1, c2,
                               bracket_iters, ls_iters)

    @search.def_vmap
    def search_vmap(axis_size, in_batched, jar, Jp, D, floss, active,
                    c1, c2):
        args = [jar, Jp, D, floss, active, c1, c2]
        flat = []
        for x, b in zip(args, in_batched):
            flat.append(x if b else jnp.broadcast_to(
                x, (axis_size,) + x.shape))
        jar, Jp, D, floss, active, c1, c2 = flat
        use_pallas = (jar.dtype == jnp.float32
                      and jax.default_backend() == "tpu")
        if use_pallas:
            alpha = _linesearch_pallas(jar, Jp, D, floss, active, c1, c2,
                                       bracket_iters, ls_iters)
        else:
            alpha = jax.vmap(
                lambda *xs: _linesearch_ref(*xs, bracket_iters, ls_iters)
            )(jar, Jp, D, floss, active, c1, c2)
        return alpha, True

    return search


def _linesearch_cost_pallas(jar, Jp, D, floss, active, c1, c2,
                            bracket_iters: int, ls_iters: int,
                            block_b: int = 128):
    """Batched linesearch + row cost on TPU: returns (alpha (B,),
    rows_cost (B,))."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, R = jar.shape
    pad = (-B) % block_b
    if pad:
        padf = lambda x: jnp.pad(x, ((0, pad),) + ((0, 0),) * (x.ndim - 1))
        jar, Jp, D, floss, active, c1, c2 = map(
            padf, (jar, Jp, D, floss, active, c1, c2))
        B = B + pad

    rows = [jnp.transpose(x, (1, 0))
            for x in (jar, Jp, D, floss, active.astype(jar.dtype))]
    scalars = [c1[None, :], c2[None, :]]

    rspec = pl.BlockSpec((R, block_b), lambda g: (0, g),
                         memory_space=pltpu.VMEM)
    sspec = pl.BlockSpec((1, block_b), lambda g: (0, g),
                         memory_space=pltpu.VMEM)
    alpha, cost = pl.pallas_call(
        functools.partial(_linesearch_cost_kernel,
                          bracket_iters=bracket_iters, ls_iters=ls_iters),
        grid=(B // block_b,),
        in_specs=[rspec] * 5 + [sspec] * 2,
        out_specs=(sspec, sspec),
        out_shape=(jax.ShapeDtypeStruct((1, B), jar.dtype),
                   jax.ShapeDtypeStruct((1, B), jar.dtype)),
        interpret=_INTERPRET,
    )(*rows, *scalars)
    a, c = alpha[0], cost[0]
    if pad:
        a, c = a[: a.shape[0] - pad], c[: c.shape[0] - pad]
    return a, c


def make_linesearch_cost(bracket_iters: int, ls_iters: int):
    """Like `make_linesearch`, returning (alpha, rows_cost-at-alpha).
    Used on the f32 path where newton_solve tracks the total cost as
    carried-quadratic + row cost instead of a separate full pass."""

    @custom_batching.custom_vmap
    def search(jar, Jp, D, floss, active, c1, c2):
        return _linesearch_cost_ref(jar, Jp, D, floss, active, c1, c2,
                                    bracket_iters, ls_iters)

    @search.def_vmap
    def search_vmap(axis_size, in_batched, jar, Jp, D, floss, active,
                    c1, c2):
        args = [jar, Jp, D, floss, active, c1, c2]
        flat = []
        for x, b in zip(args, in_batched):
            flat.append(x if b else jnp.broadcast_to(
                x, (axis_size,) + x.shape))
        jar, Jp, D, floss, active, c1, c2 = flat
        use_pallas = (jar.dtype == jnp.float32
                      and jax.default_backend() == "tpu")
        if use_pallas:
            alpha, cost = _linesearch_cost_pallas(
                jar, Jp, D, floss, active, c1, c2,
                bracket_iters, ls_iters)
        else:
            alpha, cost = jax.vmap(
                lambda *xs: _linesearch_cost_ref(
                    *xs, bracket_iters, ls_iters)
            )(jar, Jp, D, floss, active, c1, c2)
        return (alpha, cost), (True, True)

    return search


_SEARCHES = {}


def linesearch_cached(bracket_iters: int, ls_iters: int):
    key = (bracket_iters, ls_iters)
    if key not in _SEARCHES:
        _SEARCHES[key] = make_linesearch(bracket_iters, ls_iters)
    return _SEARCHES[key]


_SEARCHES_COST = {}


def linesearch_cost_cached(bracket_iters: int, ls_iters: int):
    key = (bracket_iters, ls_iters)
    if key not in _SEARCHES_COST:
        _SEARCHES_COST[key] = make_linesearch_cost(bracket_iters, ls_iters)
    return _SEARCHES_COST[key]


# ---------------------------------------------------------------------------
# Batched SPD solve (Cholesky factorize + two triangular solves)
#
# newton_solve factorizes H (nv x nv, nv<=36) once per Newton iteration
# per env.  XLA's batched cholesky/triangular_solve on TPU lower to
# row-sequential loops over HBM operands; in batch-minor VMEM the
# factorization is nv rank-1 updates of an (nv, nv, B) scratch with the
# env axis in lanes.
# ---------------------------------------------------------------------------


def _chol_solve_kernel(H_ref, g_ref, x_out_ref, A_scr, Lt_scr, y_scr,
                       *, nv: int):
    """Solve H x = g per lane.  H (nv, nv, B) symmetric PD; g (nv, B).

    A_scr holds the working matrix (kept symmetric through rank-1
    trailing updates, so column k can always be read as ROW k — a
    contiguous (nv, B) tile).  Lt_scr[k] stores column k of L.  The
    trailing update is chunked over the major axis from the chunk
    holding row k+1 (rows <= k receive exact-zero updates — skipping
    them is bit-identical and halves the factorization work); the
    column stages through y_scr because Mosaic cannot dynamic_slice
    VALUES, only refs."""
    from jax.experimental import pallas as pl
    CH = next(c for c in (8, 6, 4, 3, 2, 1) if nv % c == 0)
    nch = nv // CH
    A_scr[:] = H_ref[:]
    row_ids = jax.lax.broadcasted_iota(
        jnp.int32, (nv, H_ref.shape[-1]), 0)

    def fact_body(k, carry):
        row_k = A_scr[k]                            # (nv, B) == A[:, k, :]
        # akk = row_k[k] as a masked reduce: Mosaic has no dynamic_slice
        # lowering for VALUES (only Refs), and a (nv, B) where+sum is a
        # couple of VPU ops on VMEM-resident data.
        akk = jnp.sum(jnp.where(row_ids == k, row_k, 0.0),
                      axis=0, keepdims=True)        # (1, B)
        inv_s = jax.lax.rsqrt(akk)
        c = row_k * inv_s                           # column k of L
        c = jnp.where(row_ids >= k, c, 0.0)
        Lt_scr[k] = c
        cu = jnp.where(row_ids > k, c, 0.0)
        y_scr[:] = cu                               # stage for chunk reads

        def upd(j, _):
            sl = pl.ds(j * CH, CH)
            A_scr[sl] = A_scr[sl] - y_scr[sl][:, None, :] * cu[None, :, :]
            return 0

        jax.lax.fori_loop((k + 1) // CH, nch, upd, 0)
        return carry

    jax.lax.fori_loop(0, nv, fact_body, 0)

    # Forward solve L y = g (running column updates).
    y_scr[:] = g_ref[:]

    def fwd_body(k, carry):
        col = Lt_scr[k]                             # (nv, B), zeros above k
        lkk = jnp.sum(jnp.where(row_ids == k, col, 0.0),
                      axis=0, keepdims=True)        # (1, B)
        yk = y_scr[pl.ds(k, 1), :] / lkk
        y_scr[pl.ds(k, 1), :] = yk
        sub = jnp.where(row_ids > k, col, 0.0) * yk
        y_scr[:] = y_scr[:] - sub
        return carry

    jax.lax.fori_loop(0, nv, fwd_body, 0)

    # Back solve L^T x = y (dot with column k per step).
    x_out_ref[:] = jnp.zeros_like(y_scr[:])

    def bwd_body(kk, carry):
        k = nv - 1 - kk
        col = Lt_scr[k]
        dot = jnp.sum(jnp.where(row_ids > k, col * x_out_ref[:], 0.0),
                      axis=0, keepdims=True)        # (1, B)
        lkk = jnp.sum(jnp.where(row_ids == k, col, 0.0),
                      axis=0, keepdims=True)        # (1, B)
        xk = (y_scr[pl.ds(k, 1), :] - dot) / lkk
        x_out_ref[pl.ds(k, 1), :] = xk
        return carry

    jax.lax.fori_loop(0, nv, bwd_body, 0)


def _chol_solve_pallas(H, g, block_b: int = 128):
    """Batched SPD solve on TPU: H (B, nv, nv), g (B, nv) -> x (B, nv)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, nv, _ = H.shape
    pad = (-B) % block_b
    if pad:
        padf = lambda x: jnp.pad(x, ((0, pad),) + ((0, 0),) * (x.ndim - 1))
        H, g = padf(H), padf(g)
        # Padded lanes would divide by zero diagonals; make them identity.
        eye = jnp.eye(nv, dtype=H.dtype)
        lane = jnp.arange(B + pad) >= B
        H = jnp.where(lane[:, None, None], eye[None], H)
        B = B + pad

    H_bm = jnp.transpose(H, (1, 2, 0))              # (nv, nv, B)
    g_bm = jnp.transpose(g, (1, 0))                 # (nv, B)

    mspec = pl.BlockSpec((nv, nv, block_b), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM)
    vspec = pl.BlockSpec((nv, block_b), lambda i: (0, i),
                         memory_space=pltpu.VMEM)
    x_bm = pl.pallas_call(
        functools.partial(_chol_solve_kernel, nv=nv),
        grid=(B // block_b,),
        in_specs=[mspec, vspec],
        out_specs=vspec,
        out_shape=jax.ShapeDtypeStruct((nv, B), H.dtype),
        scratch_shapes=[
            pltpu.VMEM((nv, nv, block_b), H.dtype),
            pltpu.VMEM((nv, nv, block_b), H.dtype),
            pltpu.VMEM((nv, block_b), H.dtype),
        ],
        interpret=_INTERPRET,
    )(H_bm, g_bm)
    x = jnp.transpose(x_bm, (1, 0))
    return x[: x.shape[0] - pad] if pad else x


@custom_batching.custom_vmap
def chol_solve(H, g):
    """x = H^-1 g for SPD H.  Unbatched: jnp Cholesky (exact parity with
    the historical code path); vmapped on TPU f32: Pallas batch-minor
    kernel; vmapped elsewhere: batched jnp Cholesky."""
    L = jnp.linalg.cholesky(H)
    return jax.scipy.linalg.cho_solve((L, True), g)


@chol_solve.def_vmap
def _chol_solve_vmap(axis_size, in_batched, H, g):
    if not in_batched[0]:
        H = jnp.broadcast_to(H, (axis_size,) + H.shape)
    if not in_batched[1]:
        g = jnp.broadcast_to(g, (axis_size,) + g.shape)
    use_pallas = (H.dtype == jnp.float32
                  and jax.default_backend() == "tpu")
    if use_pallas:
        x = _chol_solve_pallas(H, g)
    else:
        L = jnp.linalg.cholesky(H)
        x = jax.scipy.linalg.cho_solve((L, True), g)
    return x, True


# ---------------------------------------------------------------------------
# Batched SPD solve with MATRIX right-hand side
#
# solver.noslip needs X = M^-1 D^T (nv x R, R ~ 129).  XLA's batched
# cholesky + triangular_solve with a matrix RHS lowers to row-sequential
# loops over HBM operands — measured 18.9 ms at (4096, 33, 33) with a
# 33-column RHS on v5e, the single largest cost inside noslip.  The
# batch-minor Pallas version factorizes once per lane-block and runs the
# two triangular sweeps on VMEM-resident (nv, R, B) tiles.
# ---------------------------------------------------------------------------


def _chol_solve_mat_kernel(H_ref, g_ref, x_out_ref, A_scr, Lt_scr, y_scr,
                           v_scr, *, nv: int):
    """Solve H X = G per lane.  H (nv, nv, B) SPD; G (nv, R, B).

    Identical factorization to _chol_solve_kernel; the forward/back
    substitutions broadcast over the R RHS columns.  The trailing
    updates are chunked over the major (nv) axis starting at the chunk
    containing row k+1 — rows <= k receive exact-zero updates in the
    unblocked form, so skipping them is bit-identical and halves the
    substitution work (the dominant cost at R ~ 4 nv).  The per-step
    column is staged through `v_scr` because Mosaic has no lowering for
    dynamic_slice on VALUES — refs support pl.ds chunk reads."""
    from jax.experimental import pallas as pl
    # Chunk size must DIVIDE nv: a partial final chunk would be clamped
    # by dynamic_slice and double-apply updates to earlier rows.
    CH = next(c for c in (8, 6, 4, 3, 2, 1) if nv % c == 0)
    nch = nv // CH
    A_scr[:] = H_ref[:]
    row_ids = jax.lax.broadcasted_iota(
        jnp.int32, (nv, H_ref.shape[-1]), 0)

    def fact_body(k, carry):
        row_k = A_scr[k]                            # (nv, B) == A[:, k, :]
        akk = jnp.sum(jnp.where(row_ids == k, row_k, 0.0),
                      axis=0, keepdims=True)        # (1, B)
        inv_s = jax.lax.rsqrt(akk)
        c = row_k * inv_s
        c = jnp.where(row_ids >= k, c, 0.0)
        Lt_scr[k] = c
        cu = jnp.where(row_ids > k, c, 0.0)
        v_scr[:] = cu

        def upd(j, _):
            sl = pl.ds(j * CH, CH)
            A_scr[sl] = A_scr[sl] - v_scr[sl][:, None, :] * cu[None, :, :]
            return 0

        jax.lax.fori_loop((k + 1) // CH, nch, upd, 0)
        return carry

    jax.lax.fori_loop(0, nv, fact_body, 0)

    # Forward solve L Y = G (running column updates over all RHS).
    y_scr[:] = g_ref[:]

    def fwd_body(k, carry):
        col = Lt_scr[k]                             # (nv, B), zeros above k
        lkk = jnp.sum(jnp.where(row_ids == k, col, 0.0),
                      axis=0, keepdims=True)        # (1, B)
        yk = y_scr[k] / lkk                         # (R, B)
        y_scr[pl.ds(k, 1), :, :] = yk[None]
        sub = jnp.where(row_ids > k, col, 0.0)      # (nv, B)
        v_scr[:] = sub

        def upd(j, _):
            sl = pl.ds(j * CH, CH)
            y_scr[sl] = y_scr[sl] - v_scr[sl][:, None, :] * yk[None, :, :]
            return 0

        jax.lax.fori_loop((k + 1) // CH, nch, upd, 0)
        return carry

    jax.lax.fori_loop(0, nv, fwd_body, 0)

    # Back solve L^T X = Y.
    x_out_ref[:] = jnp.zeros_like(y_scr[:])

    def bwd_body(kk, carry):
        k = nv - 1 - kk
        col = Lt_scr[k]                             # (nv, B)
        mask = jnp.where(row_ids > k, col, 0.0)     # (nv, B)
        v_scr[:] = mask
        B = mask.shape[-1]
        Rr = y_scr.shape[1]

        def acc_chunk(j, acc):
            sl = pl.ds(j * CH, CH)
            return acc + jnp.sum(v_scr[sl][:, None, :] * x_out_ref[sl],
                                 axis=0)            # (R, B)

        dot = jax.lax.fori_loop(
            (k + 1) // CH, nch, acc_chunk,
            jnp.zeros((Rr, B), mask.dtype))
        lkk = jnp.sum(jnp.where(row_ids == k, col, 0.0),
                      axis=0, keepdims=True)        # (1, B)
        xk = (y_scr[k] - dot) / lkk                 # (R, B)
        x_out_ref[pl.ds(k, 1), :, :] = xk[None]
        return carry

    jax.lax.fori_loop(0, nv, bwd_body, 0)


def _chol_solve_mat_pallas(H, G, block_b: int = 128):
    """Batched SPD matrix solve: H (B, nv, nv), G (B, nv, R) -> (B, nv, R)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, nv, _ = H.shape
    R = G.shape[-1]
    pad = (-B) % block_b
    if pad:
        padf = lambda x: jnp.pad(x, ((0, pad),) + ((0, 0),) * (x.ndim - 1))
        H, G = padf(H), padf(G)
        eye = jnp.eye(nv, dtype=H.dtype)
        lane = jnp.arange(B + pad) >= B
        H = jnp.where(lane[:, None, None], eye[None], H)
        B = B + pad

    H_bm = jnp.transpose(H, (1, 2, 0))              # (nv, nv, B)
    G_bm = jnp.transpose(G, (1, 2, 0))              # (nv, R, B)

    mspec = pl.BlockSpec((nv, nv, block_b), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM)
    gspec = pl.BlockSpec((nv, R, block_b), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM)
    x_bm = pl.pallas_call(
        functools.partial(_chol_solve_mat_kernel, nv=nv),
        grid=(B // block_b,),
        in_specs=[mspec, gspec],
        out_specs=gspec,
        out_shape=jax.ShapeDtypeStruct((nv, R, B), H.dtype),
        scratch_shapes=[
            pltpu.VMEM((nv, nv, block_b), H.dtype),
            pltpu.VMEM((nv, nv, block_b), H.dtype),
            pltpu.VMEM((nv, R, block_b), H.dtype),
            pltpu.VMEM((nv, block_b), H.dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_BUDGET),
        interpret=_INTERPRET,
    )(H_bm, G_bm)
    x = jnp.transpose(x_bm, (2, 0, 1))
    return x[: x.shape[0] - pad] if pad else x


def _chol_solve_mat_fac_kernel(Lt_ref, g_ref, x_out_ref, y_scr, v_scr,
                               *, nv: int):
    """Forward/back substitution only, from a prefactored Lt
    (Lt_ref[k] = column k of L as an (nv, B) tile — the layout
    _chol_solve_kernel's Lt_scr holds).  Same chunked triangular
    updates as _chol_solve_mat_kernel."""
    from jax.experimental import pallas as pl
    CH = next(c for c in (8, 6, 4, 3, 2, 1) if nv % c == 0)
    nch = nv // CH
    row_ids = jax.lax.broadcasted_iota(
        jnp.int32, (nv, Lt_ref.shape[-1]), 0)

    y_scr[:] = g_ref[:]

    def fwd_body(k, carry):
        col = Lt_ref[k]
        lkk = jnp.sum(jnp.where(row_ids == k, col, 0.0),
                      axis=0, keepdims=True)
        yk = y_scr[k] / lkk
        y_scr[pl.ds(k, 1), :, :] = yk[None]
        sub = jnp.where(row_ids > k, col, 0.0)
        v_scr[:] = sub

        def upd(j, _):
            sl = pl.ds(j * CH, CH)
            y_scr[sl] = y_scr[sl] - v_scr[sl][:, None, :] * yk[None, :, :]
            return 0

        jax.lax.fori_loop((k + 1) // CH, nch, upd, 0)
        return carry

    jax.lax.fori_loop(0, nv, fwd_body, 0)

    x_out_ref[:] = jnp.zeros_like(y_scr[:])

    def bwd_body(kk, carry):
        k = nv - 1 - kk
        col = Lt_ref[k]
        mask = jnp.where(row_ids > k, col, 0.0)
        v_scr[:] = mask
        B = mask.shape[-1]
        Rr = y_scr.shape[1]

        def acc_chunk(j, acc):
            sl = pl.ds(j * CH, CH)
            return acc + jnp.sum(v_scr[sl][:, None, :] * x_out_ref[sl],
                                 axis=0)

        dot = jax.lax.fori_loop(
            (k + 1) // CH, nch, acc_chunk,
            jnp.zeros((Rr, B), mask.dtype))
        lkk = jnp.sum(jnp.where(row_ids == k, col, 0.0),
                      axis=0, keepdims=True)
        xk = (y_scr[k] - dot) / lkk
        x_out_ref[pl.ds(k, 1), :, :] = xk[None]
        return carry

    jax.lax.fori_loop(0, nv, bwd_body, 0)


def _chol_solve_mat_fac_pallas(Lt_bm, G, block_b: int = 128):
    """Prefactored batched SPD matrix solve: Lt_bm (nv, nv, B) from
    `chol_solve_factor` (already padded/batch-minor), G (B, nv, R)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, nv, R = G.shape[0], G.shape[1], G.shape[2]
    Bp = Lt_bm.shape[-1]
    pad = Bp - B
    if pad:
        G = jnp.pad(G, ((0, pad), (0, 0), (0, 0)))
    G_bm = jnp.transpose(G, (1, 2, 0))              # (nv, R, Bp)

    mspec = pl.BlockSpec((nv, nv, block_b), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM)
    gspec = pl.BlockSpec((nv, R, block_b), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM)
    x_bm = pl.pallas_call(
        functools.partial(_chol_solve_mat_fac_kernel, nv=nv),
        grid=(Bp // block_b,),
        in_specs=[mspec, gspec],
        out_specs=gspec,
        out_shape=jax.ShapeDtypeStruct((nv, R, Bp), G.dtype),
        scratch_shapes=[
            pltpu.VMEM((nv, R, block_b), G.dtype),
            pltpu.VMEM((nv, block_b), G.dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_BUDGET),
        interpret=_INTERPRET,
    )(Lt_bm, G_bm)
    x = jnp.transpose(x_bm, (2, 0, 1))
    return x[:B] if pad else x


def _chol_factor_kernel(H_ref, Lt_out_ref, A_scr, v_scr, *, nv: int):
    """Factorization only: Lt_out_ref[k] = column k of L as (nv, B)."""
    from jax.experimental import pallas as pl
    CH = next(c for c in (8, 6, 4, 3, 2, 1) if nv % c == 0)
    nch = nv // CH
    A_scr[:] = H_ref[:]
    row_ids = jax.lax.broadcasted_iota(
        jnp.int32, (nv, H_ref.shape[-1]), 0)

    def fact_body(k, carry):
        row_k = A_scr[k]
        akk = jnp.sum(jnp.where(row_ids == k, row_k, 0.0),
                      axis=0, keepdims=True)
        inv_s = jax.lax.rsqrt(akk)
        c = row_k * inv_s
        c = jnp.where(row_ids >= k, c, 0.0)
        Lt_out_ref[k] = c
        cu = jnp.where(row_ids > k, c, 0.0)
        v_scr[:] = cu

        def upd(j, _):
            sl = pl.ds(j * CH, CH)
            A_scr[sl] = A_scr[sl] - v_scr[sl][:, None, :] * cu[None, :, :]
            return 0

        jax.lax.fori_loop((k + 1) // CH, nch, upd, 0)
        return carry

    jax.lax.fori_loop(0, nv, fact_body, 0)


def chol_factor_bm(H, block_b: int = 128):
    """Batch-minor Cholesky factor for reuse across solves on the TPU
    f32 path: H (B, nv, nv) -> Lt_bm (nv, nv, Bp) with Bp lane-padded,
    Lt_bm[k] = column k of L.  Padded lanes factor the identity."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, nv, _ = H.shape
    pad = (-B) % block_b
    if pad:
        H = jnp.pad(H, ((0, pad), (0, 0), (0, 0)))
        eye = jnp.eye(nv, dtype=H.dtype)
        lane = jnp.arange(B + pad) >= B
        H = jnp.where(lane[:, None, None], eye[None], H)
    Bp = B + pad
    H_bm = jnp.transpose(H, (1, 2, 0))

    mspec = pl.BlockSpec((nv, nv, block_b), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_chol_factor_kernel, nv=nv),
        grid=(Bp // block_b,),
        in_specs=[mspec],
        out_specs=mspec,
        out_shape=jax.ShapeDtypeStruct((nv, nv, Bp), H.dtype),
        scratch_shapes=[
            pltpu.VMEM((nv, nv, block_b), H.dtype),
            pltpu.VMEM((nv, block_b), H.dtype),
        ],
        interpret=_INTERPRET,
    )(H_bm)


@custom_batching.custom_vmap
def chol_solve_factor(H, g):
    """x = H^-1 g plus a REUSABLE factor of H (for a later matrix-RHS
    solve against the same H — noslip reuses the mass-matrix factor
    computed for qacc_smooth).  Unbatched: fac = lower-triangular L.
    Vmapped TPU f32: one Pallas factorization + substitution; fac is
    the batch of L matrices (as _chol_solve_kernel's Lt columns)."""
    L = jnp.linalg.cholesky(H)
    x = jax.scipy.linalg.cho_solve((L, True), g)
    return x, jnp.swapaxes(L, -1, -2)   # fac[k] = column k of L


@chol_solve_factor.def_vmap
def _chol_solve_factor_vmap(axis_size, in_batched, H, g):
    if not in_batched[0]:
        H = jnp.broadcast_to(H, (axis_size,) + H.shape)
    if not in_batched[1]:
        g = jnp.broadcast_to(g, (axis_size,) + g.shape)
    B = H.shape[0]
    use_pallas = (H.dtype == jnp.float32
                  and jax.default_backend() == "tpu")
    if use_pallas:
        Lt_bm = chol_factor_bm(H)                       # (nv, nv, Bp)
        x = _chol_solve_mat_fac_pallas(Lt_bm, g[..., None])[..., 0]
        fac = jnp.moveaxis(Lt_bm, -1, 0)[:B]            # (B, nv, nv)
    else:
        L = jnp.linalg.cholesky(H)
        x = jax.scipy.linalg.cho_solve((L, True), g)
        # Keep the TPU fac layout (fac[b, k] = column k of L) so a
        # mixed-backend consumer sees one convention.
        fac = jnp.swapaxes(L, -1, -2)
    return (x, fac), (True, True)


@custom_batching.custom_vmap
def chol_solve_mat_fac(fac, G):
    """X = H^-1 G from a `chol_solve_factor` factor (fac[k] = column k
    of L, i.e. L^T)."""
    L = jnp.swapaxes(fac, -1, -2)
    return jax.scipy.linalg.cho_solve((L, True), G)


@chol_solve_mat_fac.def_vmap
def _chol_solve_mat_fac_vmap(axis_size, in_batched, fac, G):
    if not in_batched[0]:
        fac = jnp.broadcast_to(fac, (axis_size,) + fac.shape)
    if not in_batched[1]:
        G = jnp.broadcast_to(G, (axis_size,) + G.shape)
    use_pallas = (fac.dtype == jnp.float32
                  and jax.default_backend() == "tpu")
    if use_pallas:
        B, nv = fac.shape[0], fac.shape[1]
        pad = (-B) % 128
        if pad:
            # Padded lanes must hold an identity factor (unit diagonal).
            eyeT = jnp.eye(nv, dtype=fac.dtype)
            lane = jnp.arange(B + pad) >= B
            fac = jnp.where(lane[:, None, None], eyeT[None],
                            jnp.pad(fac, ((0, pad), (0, 0), (0, 0))))
        Lt_bm = jnp.moveaxis(fac, 0, -1)                # (nv, nv, Bp)
        x = _chol_solve_mat_fac_pallas(Lt_bm, G)
    else:
        L = jnp.swapaxes(fac, -1, -2)
        x = jax.scipy.linalg.cho_solve((L, True), G)
    return x, True


@custom_batching.custom_vmap
def chol_solve_mat(H, G):
    """X = H^-1 G for SPD H and matrix G (nv, R).  Unbatched: jnp
    Cholesky (parity path); vmapped on TPU f32: Pallas batch-minor
    kernel; vmapped elsewhere: batched jnp Cholesky."""
    L = jnp.linalg.cholesky(H)
    return jax.scipy.linalg.cho_solve((L, True), G)


@chol_solve_mat.def_vmap
def _chol_solve_mat_vmap(axis_size, in_batched, H, G):
    if not in_batched[0]:
        H = jnp.broadcast_to(H, (axis_size,) + H.shape)
    if not in_batched[1]:
        G = jnp.broadcast_to(G, (axis_size,) + G.shape)
    use_pallas = (H.dtype == jnp.float32
                  and jax.default_backend() == "tpu")
    if use_pallas:
        x = _chol_solve_mat_pallas(H, G)
    else:
        L = jnp.linalg.cholesky(H)
        x = jax.scipy.linalg.cho_solve((L, True), G)
    return x, True


# -- probe-problem generators (shared by tests/test_kernels.py and
#    tools/tpu_kernel_check.py so the hardware check exercises exactly
#    the distributions the interpret-mode tests validate) ---------------

def random_noslip_problem(key, B, R, dtype=jnp.float32):
    """Random (A, a_safe, lo, hi, gate, r0, u0) noslip sweep inputs:
    SPD-ish A with dominant diagonal (like D Minv D^T), box bounds,
    ~75% active rows."""
    ks = jax.random.split(key, 7)
    G = jax.random.normal(ks[0], (B, R, R), dtype)
    A = jnp.einsum("bik,bjk->bij", G, G) / R + 2.0 * jnp.eye(R, dtype=dtype)
    a_safe = jnp.maximum(jnp.einsum("bii->bi", A), 1e-3)
    lo = -jax.random.uniform(ks[1], (B, R), dtype, 0.1, 2.0)
    hi = jax.random.uniform(ks[2], (B, R), dtype, 0.1, 2.0)
    gate = (jax.random.uniform(ks[3], (B, R)) > 0.25).astype(dtype)
    r0 = jax.random.normal(ks[4], (B, R), dtype)
    u0 = jnp.clip(jax.random.normal(ks[5], (B, R), dtype) * 0.1, lo, hi)
    return A, a_safe, lo, hi, gate, r0, u0


def random_linesearch_problem(key, B, R, dtype=jnp.float32):
    """Random (jar, Jp, D, floss, active, c1, c2) linesearch inputs with
    a guaranteed descent direction (c1 < 0) and ~30% frictionloss rows."""
    ks = jax.random.split(key, 7)
    jar = jax.random.normal(ks[0], (B, R), dtype)
    Jp = jax.random.normal(ks[1], (B, R), dtype)
    D = jax.random.uniform(ks[2], (B, R), dtype, 0.1, 10.0)
    floss = jnp.where(jax.random.uniform(ks[3], (B, R)) > 0.7,
                      jax.random.uniform(ks[4], (B, R), dtype, 0.1, 3.0),
                      0.0)
    active = jax.random.uniform(ks[5], (B, R)) > 0.2
    c1 = -jax.random.uniform(ks[6], (B,), dtype, 0.1, 5.0)
    c2 = jax.random.uniform(ks[0], (B,), dtype, 0.5, 5.0)
    return jar, Jp, D, floss, active, c1, c2
