"""Natural Policy Gradient (TRPO-style normalized step) + DAPG in JAX.

The reference's DAPG path delegates training to mjrl's `NPG`/`DAPG`
learners (`mj_envs_vision/algos/baselines.py:43-86` only LOADS pickles
trained that way; training lived in the external mjrl repo).  This module
re-creates that learner TPU-natively so the framework can train the same
mjrl-style Gaussian MLP policies it evaluates:

* policy: tanh MLP (default (32,32)) with state-independent log_std —
  the exact architecture of the pretrained pickles (`algos/dapg.py`).
* baseline: mjrl's linear feature baseline (features
  [o, o^2, t, t^2, t^3, 1], ridge-regularized least squares), fitted
  in-graph per iteration.
* update: natural gradient F^-1 g via conjugate gradient on
  Fisher-vector products (Gauss-Newton form: F = J^T diag(s) J for the
  Gaussian), with mjrl's normalized step size
  alpha = sqrt(2 delta / (g^T F^-1 g)).
* DAPG option: when demo (obs, act) batches are supplied, the vanilla
  policy gradient is augmented with lam0 * lam1^k weighted behavior-
  cloning gradient on the demos (Rajeswaran et al. 2018) — the scheme
  the pretrained Adroit experts were produced with.

Everything (rollout, GAE, CG, line search) is one jitted function,
vmapped over thousands of envs and shardable over a device mesh exactly
like `algos/ppo.py`.
"""
from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.flatten_util
import jax.numpy as jnp

from . import networks as N
from ..envs.base import AdroitEnv, EnvState


class NPGConfig(NamedTuple):
    normalized_step_size: float = 0.1    # delta (mjrl default 0.01-0.1)
    gamma: float = 0.995
    gae_lambda: float = 0.97
    n_steps: int = 64                    # rollout length per iteration
    cg_iters: int = 10
    cg_damping: float = 1e-4
    hidden: Tuple[int, ...] = (32, 32)
    init_log_std: float = -0.5
    baseline_reg: float = 1e-3
    # DAPG demo-augmentation (used only when demos are passed):
    lam0: float = 1e-2
    lam1: float = 0.95


class NPGState(NamedTuple):
    params: Any
    iteration: jnp.ndarray        # () int32 — for the DAPG lam1^k decay
    key: jax.Array


class Transition(NamedTuple):
    obs: jnp.ndarray
    action: jnp.ndarray
    reward: jnp.ndarray
    done: jnp.ndarray
    t: jnp.ndarray                # per-env episode step (for baseline feats)
    truncated: jnp.ndarray        # boundary was the episode cap
    final_obs: jnp.ndarray        # finishing obs at boundaries
    t_final: jnp.ndarray          # finishing step index (baseline feats)


def _policy_init(key, obs_dim, act_dim, cfg: NPGConfig):
    kp, = jax.random.split(key, 1)
    return {
        "actor": N.mlp_init(kp, (obs_dim, *cfg.hidden, act_dim), 0.01),
        "log_std": jnp.full((act_dim,), cfg.init_log_std, jnp.float32),
    }


def _policy_apply(params, obs):
    return N.mlp_apply(params["actor"], obs), params["log_std"]


def _baseline_features(obs, t):
    """mjrl LinearBaseline features: [o, o^2, t, t^2, t^3, 1] with
    t scaled by 1e-3 (mjrl convention)."""
    al = t[..., None].astype(obs.dtype) / 1000.0
    return jnp.concatenate(
        [obs, obs * obs, al, al ** 2, al ** 3, jnp.ones_like(al)], axis=-1)


def _fit_baseline(feats, returns, reg):
    """Ridge least-squares fit, (N, F) @ w ~= (N,)."""
    F = feats.shape[-1]
    A = feats.T @ feats + reg * jnp.eye(F, dtype=feats.dtype)
    b = feats.T @ returns
    return jnp.linalg.solve(A, b)


def make_npg(env: AdroitEnv, num_envs: int, cfg: NPGConfig = NPGConfig(),
             demos: Optional[Dict[str, jnp.ndarray]] = None):
    """Build (init_fn, train_iter_fn, act_fn).

    train_iter_fn(state, env_state) -> (state, env_state, metrics): one
    NPG iteration = on-device rollout + baseline fit + CG natural
    gradient step.  When `demos` = {"obs": (D, obs_dim), "actions":
    (D, nu)} is given the update is DAPG."""
    from ..parallel.vector import chunked_vmap
    # Chunked stepping: holds per-env solver cost flat at large fleets
    # (see parallel/vector.chunked_vmap).
    v_step = chunked_vmap(env.step_auto_reset, 512)

    def init_fn(key) -> NPGState:
        kp, kt = jax.random.split(key)
        return NPGState(params=_policy_init(kp, env.OBS_DIM, env.nu, cfg),
                        iteration=jnp.zeros((), jnp.int32), key=kt)

    def act_fn(params, obs, key):
        mean, log_std = _policy_apply(params, obs)
        return N.gaussian_sample(key, mean, log_std)

    def rollout(params, env_state: EnvState, key):
        def step_fn(carry, _):
            es, k = carry
            k, ka = jax.random.split(k)
            action = act_fn(params, es.obs, ka)
            es2 = v_step(es, jnp.clip(action, -1.0, 1.0))
            tr = Transition(obs=es.obs, action=action, reward=es2.reward,
                            done=es2.done, t=es.step_count,
                            truncated=es2.truncated,
                            final_obs=es2.final_obs,
                            t_final=es.step_count + 1)
            return (es2, k), tr

        (env_state, _), traj = jax.lax.scan(
            step_fn, (env_state, key), None, length=cfg.n_steps)
        return env_state, traj

    def gae(traj: Transition, values, trunc_boots, last_value):
        def scan_fn(carry, x):
            adv_next, v_next = carry
            r, d, v, tb = x
            nonterm = 1.0 - d.astype(v.dtype)
            # boundary value: 0 at termination/quarantine, baseline
            # V(final_obs) at pure truncation (SB3 TimeLimit semantics)
            delta = r + cfg.gamma * (v_next * nonterm + tb) - v
            adv = delta + cfg.gamma * cfg.gae_lambda * nonterm * adv_next
            return (adv, v), adv

        (_, _), advs = jax.lax.scan(
            scan_fn, (jnp.zeros_like(last_value), last_value),
            (traj.reward, traj.done, values, trunc_boots), reverse=True)
        return advs

    def mean_logp(params, obs, act):
        mean, log_std = _policy_apply(params, obs)
        return jnp.mean(N.gaussian_log_prob(mean, log_std, act))

    def surrogate(params, obs, act, adv_n):
        mean, log_std = _policy_apply(params, obs)
        logp = N.gaussian_log_prob(mean, log_std, act)
        return jnp.mean(logp * adv_n)

    def fisher_vp(params, obs, v_flat, unravel):
        """Fisher-vector product for the diagonal Gaussian via the
        Gauss-Newton form: F v = J^T (S (J v)) where J = d(mean,
        log_std)/d theta and S the per-output Fisher of the Gaussian
        (1/sigma^2 for means, 2 for log_std)."""
        v = unravel(v_flat)

        def outputs(p):
            mean, log_std = _policy_apply(p, obs)
            return mean, jnp.broadcast_to(log_std, mean.shape)

        mean, log_std = outputs(params)
        inv_var = jnp.exp(-2.0 * log_std)
        _, jv = jax.jvp(outputs, (params,), (v,))
        sm = jv[0] * inv_var / mean.shape[0]
        ss = jv[1] * 2.0 / mean.shape[0]
        _, vjp = jax.vjp(outputs, params)
        (fv,) = vjp((sm, ss))
        return jax.flatten_util.ravel_pytree(fv)[0] \
            + cfg.cg_damping * v_flat

    def conjugate_gradient(mvp, b):
        def body(carry, _):
            x, r, p, rs = carry
            Ap = mvp(p)
            alpha = rs / jnp.maximum(p @ Ap, 1e-20)
            x = x + alpha * p
            r = r - alpha * Ap
            rs_new = r @ r
            p = r + (rs_new / jnp.maximum(rs, 1e-20)) * p
            return (x, r, p, rs_new), None

        x0 = jnp.zeros_like(b)
        (x, _, _, _), _ = jax.lax.scan(
            body, (x0, b, b, b @ b), None, length=cfg.cg_iters)
        return x

    def train_iter_fn(state: NPGState, env_state: EnvState):
        key, kr = jax.random.split(state.key)
        env_state, traj = rollout(state.params, env_state, kr)
        T, B = traj.reward.shape

        # Baseline: fit on THIS batch's returns (mjrl fits after
        # computing advantages with the previous fit; one-batch fit is
        # the standard jitted simplification and keeps the estimator
        # unbiased for the gradient).
        flat = jax.tree_util.tree_map(
            lambda x: x.reshape(T * B, *x.shape[2:]), traj)

        def disc_returns(r, d):
            def scan_fn(ret_next, x):
                r_t, d_t = x
                ret = r_t + cfg.gamma * ret_next * (1.0 - d_t)
                return ret, ret
            _, rets = jax.lax.scan(
                scan_fn, jnp.zeros_like(r[0]),
                (r, d.astype(r.dtype)), reverse=True)
            return rets

        rets = disc_returns(traj.reward, traj.done)
        feats = _baseline_features(flat.obs, flat.t)
        w = _fit_baseline(feats, rets.reshape(T * B), cfg.baseline_reg)
        values = (feats @ w).reshape(T, B)
        fin_feats = _baseline_features(flat.final_obs, flat.t_final)
        fin_values = (fin_feats @ w).reshape(T, B)
        trunc_boots = jnp.where(traj.truncated, fin_values, 0.0)
        last_feats = _baseline_features(env_state.obs, env_state.step_count)
        last_value = last_feats @ w
        advs = gae(traj, values, trunc_boots, last_value).reshape(T * B)
        adv_n = (advs - advs.mean()) / (advs.std() + 1e-8)

        # Vanilla policy gradient (+ DAPG demo term).
        g = jax.grad(surrogate)(state.params, flat.obs, flat.action, adv_n)
        if demos is not None:
            demo_w = cfg.lam0 * cfg.lam1 ** state.iteration.astype(
                jnp.float32)
            g_demo = jax.grad(mean_logp)(
                state.params, demos["obs"], demos["actions"])
            g = jax.tree_util.tree_map(
                lambda a, b: a + demo_w * b, g, g_demo)

        g_flat, unravel = jax.flatten_util.ravel_pytree(g)
        mvp = lambda v: fisher_vp(state.params, flat.obs, v, unravel)
        npg_dir = conjugate_gradient(mvp, g_flat)
        quad = g_flat @ npg_dir
        # Non-positive curvature (CG on an ill-conditioned Fisher in f32
        # can cancel g.F^-1 g to ~0 or below) would send the normalized
        # step size to ~1e10 and destroy the policy in one update —
        # mjrl's dense solve can't hit this, so guard: reject the step
        # (alpha=0) instead of taking an unbounded one.
        alpha = jnp.where(
            quad > 1e-10,
            jnp.sqrt(2.0 * cfg.normalized_step_size
                     / jnp.maximum(quad, 1e-10)),
            0.0)
        new_params = jax.tree_util.tree_map(
            lambda p, d: p + alpha * d, state.params, unravel(npg_dir))

        # Approximate KL of the step (for diagnostics; mjrl prints it).
        mean_o, ls_o = _policy_apply(state.params, flat.obs)
        mean_n, ls_n = _policy_apply(new_params, flat.obs)
        kl = jnp.mean(jnp.sum(
            ls_n - ls_o + (jnp.exp(2 * ls_o)
                           + (mean_o - mean_n) ** 2)
            / (2.0 * jnp.exp(2 * ls_n)) - 0.5, axis=-1))

        metrics = dict(
            mean_reward=traj.reward.mean(),
            mean_return=rets[0].mean(),
            step_size=alpha, kl=kl,
            grad_norm=jnp.linalg.norm(g_flat),
            nan_resets=env_state.nan_resets.sum(),
        )
        return NPGState(params=new_params, iteration=state.iteration + 1,
                        key=key), env_state, metrics

    return init_fn, train_iter_fn, act_fn
