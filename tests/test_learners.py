"""Smoke/semantics tests for the NPG and SAC learners and the
TensorBoard metrics sink.

The NPG math (CG on Fisher-vector products, normalized step size) is
checked against direct dense computation on a tiny problem; the full
train_iter paths run one iteration on a small hammer env batch (finite
metrics, parameters move).
"""
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mj_envs_tpu import envs


def test_npg_fisher_cg_matches_dense():
    """CG solution of F x = g must match dense solve on a tiny policy."""
    from mj_envs_tpu.algos import npg as NPG
    import jax.flatten_util

    # Damping keeps the Fisher's condition number modest — this checks
    # the CG/Fisher-vector-product plumbing, not extreme conditioning
    # (the near-null directions of a tiny random policy put the
    # undamped solve at cond ~1e12, where even f64 CG wobbles ~5%).
    cfg = NPG.NPGConfig(hidden=(4,), cg_iters=80, cg_damping=1e-3)
    params = NPG._policy_init(jax.random.PRNGKey(0), 5, 2, cfg)
    # f64 end-to-end (the test env enables x64; params init f32)
    params = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.float64), params)
    obs = jax.random.normal(jax.random.PRNGKey(1), (32, 5))

    flat0, unravel = jax.flatten_util.ravel_pytree(params)
    n = flat0.shape[0]
    g = jax.random.normal(jax.random.PRNGKey(2), (n,))

    # Dense Fisher via explicit jacobians of (mean, log_std).
    def outputs_flat(p_flat):
        p = unravel(p_flat)
        mean = NPG._policy_apply(p, obs)[0]
        ls = jnp.broadcast_to(p["log_std"], mean.shape)
        return mean, ls

    Jm = jax.jacobian(lambda p: outputs_flat(p)[0])(flat0)  # (B,A,n)
    Js = jax.jacobian(lambda p: outputs_flat(p)[1])(flat0)
    mean, ls = outputs_flat(flat0)
    inv_var = jnp.exp(-2.0 * ls)
    B = obs.shape[0]
    F = (jnp.einsum("bai,ba,baj->ij", Jm, inv_var, Jm)
         + 2.0 * jnp.einsum("bai,baj->ij", Js, Js)) / B
    F = F + cfg.cg_damping * jnp.eye(n)
    want = jnp.linalg.solve(F, g)

    # Re-create the mvp exactly as train_iter does.
    def fisher_vp(v_flat):
        v = unravel(v_flat)

        def outputs(p):
            mean, log_std = NPG._policy_apply(p, obs)
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

    # quick dense consistency of the mvp itself
    v = jax.random.normal(jax.random.PRNGKey(3), (n,))
    np.testing.assert_allclose(np.asarray(fisher_vp(v)),
                               np.asarray(F @ v), rtol=1e-4, atol=1e-6)

    def body(carry, _):
        x, r, p, rs = carry
        Ap = fisher_vp(p)
        alpha = rs / jnp.maximum(p @ Ap, 1e-20)
        x = x + alpha * p
        r = r - alpha * Ap
        rs_new = r @ r
        p = r + (rs_new / jnp.maximum(rs, 1e-20)) * p
        return (x, r, p, rs_new), None

    (x, _, _, _), _ = jax.lax.scan(
        body, (jnp.zeros(n), g, g, g @ g), None, length=cfg.cg_iters)
    np.testing.assert_allclose(np.asarray(x), np.asarray(want),
                               rtol=1e-3, atol=1e-5)


@pytest.mark.slow
def test_npg_train_iter_smoke():
    env = envs.make("hammer-v0")
    from mj_envs_tpu.algos import npg as NPG
    num_envs = 2
    cfg = NPG.NPGConfig(n_steps=4, cg_iters=3, hidden=(8, 8))
    init_fn, train_iter_fn, act_fn = NPG.make_npg(env, num_envs, cfg)
    state = init_fn(jax.random.PRNGKey(0))
    env_state = jax.jit(jax.vmap(env.reset))(
        jax.random.split(jax.random.PRNGKey(1), num_envs))
    state2, env_state2, m = jax.jit(train_iter_fn)(state, env_state)
    for k, v in m.items():
        assert np.isfinite(float(v)), (k, v)
    assert int(state2.iteration) == 1
    d = jax.tree_util.tree_reduce(
        lambda a, ab: a + float(jnp.abs(ab).sum()),
        jax.tree_util.tree_map(lambda a, b: a - b,
                               state.params, state2.params), 0.0)
    assert d > 0.0


@pytest.mark.slow
def test_sac_train_iter_smoke():
    env = envs.make("hammer-v0")
    from mj_envs_tpu.algos import sac as SAC
    num_envs = 2
    cfg = SAC.SACConfig(hidden=(16, 16), buffer_size=256, batch_size=16,
                        steps_per_iter=4, updates_per_iter=2,
                        warmup_steps=0)
    init_fn, train_iter_fn, act_fn = SAC.make_sac(env, num_envs, cfg)
    state = init_fn(jax.random.PRNGKey(0))
    env_state = jax.jit(jax.vmap(env.reset))(
        jax.random.split(jax.random.PRNGKey(1), num_envs))
    step = jax.jit(train_iter_fn)
    # two iters: first fills replay (8 transitions), second updates too
    state, env_state, m1 = step(state, env_state)
    state, env_state, m2 = step(state, env_state)
    assert int(state.replay.size) == 16
    assert int(state.env_steps) == 16
    for k, v in m2.items():
        assert np.isfinite(float(v)), (k, v)
    # ring indices advanced
    assert int(state.replay.idx) == 16 % cfg.buffer_size


def test_sac_replay_ring_wraps():
    from mj_envs_tpu.algos.sac import Replay
    cap, od, ad = 8, 3, 2
    rep = Replay(obs=jnp.zeros((cap, od)), action=jnp.zeros((cap, ad)),
                 reward=jnp.zeros((cap,)), next_obs=jnp.zeros((cap, od)),
                 done=jnp.zeros((cap,), bool),
                 idx=jnp.asarray(6, jnp.int32),
                 size=jnp.asarray(6, jnp.int32))
    B = 4
    batch = dict(obs=jnp.arange(B * od, dtype=jnp.float32).reshape(B, od),
                 action=jnp.ones((B, ad)), reward=jnp.arange(B, dtype=jnp.float32),
                 next_obs=jnp.zeros((B, od)), done=jnp.zeros((B,), bool))
    # replicate _store logic through make_sac's closure: test the ring
    at = (rep.idx + jnp.arange(B)) % cap
    rep2 = Replay(
        obs=rep.obs.at[at].set(batch["obs"]),
        action=rep.action.at[at].set(batch["action"]),
        reward=rep.reward.at[at].set(batch["reward"]),
        next_obs=rep.next_obs.at[at].set(batch["next_obs"]),
        done=rep.done.at[at].set(batch["done"]),
        idx=(rep.idx + B) % cap,
        size=jnp.minimum(rep.size + B, cap))
    assert int(rep2.idx) == 2
    assert int(rep2.size) == 8
    np.testing.assert_allclose(np.asarray(rep2.reward)[[6, 7, 0, 1]],
                               [0, 1, 2, 3])


def test_metrics_tensorboard_sink(tmp_path):
    """Metrics writes CSV and tensorboard event files."""
    from mj_envs_tpu.utils.train import Metrics
    m = Metrics(tb_dir=str(tmp_path))
    m.append(episode=1, reward=1.5)
    m.append(episode=2, reward=2.5, loss=0.1)
    m.save_csv(str(tmp_path / "metrics.csv"))
    m.close()
    assert (tmp_path / "metrics.csv").exists()
    evts = [f for f in os.listdir(tmp_path) if "tfevents" in f]
    assert evts, "no tensorboard event file written"


@pytest.mark.slow
def test_npg_and_sac_train_iter_sharded_mesh():
    """BASELINE config #4 shape: env-axis-sharded rollout feeding the
    NPG and SAC learners, one jitted train_iter over an 8-virtual-device
    mesh.  Checks metrics are finite AND the post-step env state keeps
    its env-axis sharding (layout regression guard, like
    __graft_entry__.dryrun_multichip does for PPO)."""
    from mj_envs_tpu.parallel import distributed as DIST
    from mj_envs_tpu.algos import npg as NPG
    from mj_envs_tpu.algos import sac as SAC

    env = envs.make("hammer-v0")
    mesh = DIST.make_mesh(model_axis=1)
    shard = DIST.env_sharding(mesh)
    num_envs = 8

    def sharded_env_state(key):
        keys = jax.device_put(jax.random.split(key, num_envs), shard)
        st = jax.jit(jax.vmap(env.reset))(keys)
        return jax.device_put(st, shard)

    # --- NPG ---------------------------------------------------------
    cfg = NPG.NPGConfig(n_steps=2, cg_iters=2, hidden=(8, 8))
    init_fn, train_iter_fn, _ = NPG.make_npg(env, num_envs, cfg)
    state = init_fn(jax.random.PRNGKey(0))
    env_state = sharded_env_state(jax.random.PRNGKey(1))
    state, env_state, m = jax.jit(train_iter_fn)(state, env_state)
    for k, v in m.items():
        assert np.isfinite(float(v)), ("npg", k, v)
    assert "env" in str(env_state.data.qpos.sharding.spec)

    # --- SAC ---------------------------------------------------------
    scfg = SAC.SACConfig(hidden=(16, 16), buffer_size=64, batch_size=8,
                         steps_per_iter=2, updates_per_iter=1,
                         warmup_steps=0)
    sinit, siter, _ = SAC.make_sac(env, num_envs, scfg)
    sstate = sinit(jax.random.PRNGKey(2))
    env_state = sharded_env_state(jax.random.PRNGKey(3))
    sstate, env_state, sm = jax.jit(siter)(sstate, env_state)
    sstate, env_state, sm = jax.jit(siter)(sstate, env_state)
    for k, v in sm.items():
        assert np.isfinite(float(v)), ("sac", k, v)
    assert "env" in str(env_state.data.qpos.sharding.spec)
