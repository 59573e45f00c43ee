"""Unit tests: config round-trip, checkpoint save/restore, DAPG loader,
PPO shapes, quatmath vs the reference formulas."""
import json
import os

import numpy as np
import pytest


def test_config_reference_json_compat(tmp_path):
    """The reference's own test_config.json loads unchanged."""
    from mj_envs_tpu.utils.config import load_config
    ref = "/root/reference/mj_envs_vision/utils/test_config.json"
    if not os.path.exists(ref):
        pytest.skip("reference not mounted")
    cfg = load_config(ref, "ppo")
    assert cfg.seed == 3
    assert cfg.env_name == "Walker2d-v2"
    assert cfg.max_episode_length == 200
    assert cfg.model_type == "mlp"


def test_config_save_saves_self(tmp_path):
    """Reference bug (save dumps defaults, config.py:74) must be fixed."""
    from mj_envs_tpu.utils.config import Config
    c = Config()
    c.seed = 1234
    p = str(tmp_path / "c.json")
    c.save(p)
    assert json.load(open(p))["seed"] == 1234


def test_shipped_configs_load_clean(capsys):
    """Every example config under configs/ loads through load_config for
    its policy type with no unknown-key warnings, and names a registered
    task (the `python -m mj_envs_tpu.run configs/... <type>` path)."""
    from mj_envs_tpu.utils.config import load_config
    from mj_envs_tpu import envs

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cfg_dir = os.path.join(repo, "configs")
    files = sorted(f for f in os.listdir(cfg_dir) if f.endswith(".json"))
    assert files, "no shipped configs found"
    for fname in files:
        policy_type = fname.rsplit("_", 1)[1][:-5]   # hammer_ppo.json -> ppo
        cfg = load_config(os.path.join(cfg_dir, fname), policy_type)
        out = capsys.readouterr().out
        assert "No such config field" not in out, (fname, out)
        assert cfg.env_name in envs._REGISTRY, (fname, cfg.env_name)


def test_checkpoint_roundtrip(tmp_path):
    import jax.numpy as jnp
    from mj_envs_tpu.utils import checkpoint as CKPT
    tree = {"a": jnp.arange(5.0), "b": {"c": jnp.ones((2, 2))}}
    p = CKPT.checkpoint_path(str(tmp_path), 7)
    CKPT.save(p, tree)
    zero = {"a": jnp.zeros(5), "b": {"c": jnp.zeros((2, 2))}}
    back = CKPT.restore(p, zero)
    assert np.allclose(back["a"], np.arange(5.0))
    assert CKPT.latest(str(tmp_path)) == p


def test_dapg_loader_all_tasks():
    import jax.numpy as jnp
    from mj_envs_tpu.algos import dapg
    dims = {"hammer": (46, 26), "door": (39, 28), "pen": (45, 24),
            "relocate": (39, 30)}
    for task, (od, ad) in dims.items():
        act, params = dapg.load_policy(task)
        assert params["obs_dim"] == od and params["act_dim"] == ad
        a = act(jnp.zeros(od))
        assert a.shape == (ad,)
        assert np.all(np.isfinite(np.asarray(a)))


def test_ppo_shapes_and_update():
    """One tiny PPO iteration end-to-end on CPU (2 envs)."""
    import jax
    from mj_envs_tpu import envs
    from mj_envs_tpu.algos import ppo
    env = envs.make("door-v0")   # frame_skip 1: cheapest to compile
    cfg = ppo.PPOConfig(n_steps=2, n_minibatches=2, n_epochs=1,
                        hidden=(16,))
    init_fn, train_iter_fn, act_fn = ppo.make_ppo(env, 2, cfg)
    ts = init_fn(jax.random.PRNGKey(0))
    es = jax.vmap(env.reset)(jax.random.split(jax.random.PRNGKey(1), 2))
    ts2, es2, m = jax.jit(train_iter_fn)(ts, es)
    assert np.isfinite(float(m["pg_loss"]))
    assert np.isfinite(float(m["mean_reward"]))
    # params actually changed
    leaves0 = jax.tree_util.tree_leaves(ts.params)
    leaves1 = jax.tree_util.tree_leaves(ts2.params)
    assert any(not np.allclose(a, b) for a, b in zip(leaves0, leaves1))


def test_quatmath_vs_reference_formulas():
    """Spot-check our JAX quatmath against NumPy transcriptions of the
    reference formulas (`utils/quatmath.py:60-76,136-164`)."""
    import jax.numpy as jnp
    from mj_envs_tpu.utils import quatmath as Q

    rng = np.random.default_rng(3)
    for _ in range(20):
        e = rng.uniform(-2, 2, 3)
        # reference euler2quat (:60-76)
        ai, aj, ak = e[2] / 2, -e[1] / 2, e[0] / 2
        si, sj, sk = np.sin([ai, aj, ak])
        ci, cj, ck = np.cos([ai, aj, ak])
        cc, cs = ci * ck, ci * sk
        sc, ss = si * ck, si * sk
        ref = np.array([cj * cc + sj * ss, cj * cs - sj * sc,
                        -(cj * ss + sj * cc), cj * sc - sj * cs])
        ours = np.asarray(Q.euler2quat(jnp.asarray(e)))
        assert np.allclose(ours, ref, atol=1e-12)
        # quat2euler(euler2quat(e)) only matches for euler in the
        # principal branch; check via rotation-matrix round trip instead.
        m_ours = np.asarray(Q.quat2mat(jnp.asarray(ref)))
        e2 = np.asarray(Q.quat2euler(jnp.asarray(ref)))
        m_back = np.asarray(Q.quat2mat(Q.euler2quat(jnp.asarray(e2))))
        assert np.allclose(m_ours, m_back, atol=1e-8)


def test_quatmath_full_api():
    """The remaining reference quatmath surface (`utils/quatmath.py:
    7-57,99-133`): mulQuat/negQuat/quat2Vel/quatDiff2Vel/axis_angle2quat/
    euler2mat/mat2quat — identity and cross-consistency checks in f64."""
    import jax.numpy as jnp
    from mj_envs_tpu.utils import quatmath as Q

    rng = np.random.default_rng(7)
    for _ in range(20):
        q = rng.normal(size=4)
        q /= np.linalg.norm(q)
        r = rng.normal(size=4)
        r /= np.linalg.norm(r)
        qj, rj = jnp.asarray(q), jnp.asarray(r)

        # mulQuat against rotation-matrix composition.
        m = np.asarray(Q.quat2mat(Q.mulQuat(qj, rj)))
        m_ref = np.asarray(Q.quat2mat(qj)) @ np.asarray(Q.quat2mat(rj))
        assert np.allclose(m, m_ref, atol=1e-10)

        # negQuat is the inverse for unit quats.
        ident = np.asarray(Q.quat2mat(Q.mulQuat(qj, Q.negQuat(qj))))
        assert np.allclose(ident, np.eye(3), atol=1e-10)

        # mat2quat(quat2mat(q)) == q up to sign; w kept non-negative.
        q_back = np.asarray(Q.mat2quat(Q.quat2mat(qj)))
        sign = np.sign(q[0]) if q[0] != 0 else 1.0
        assert np.allclose(q_back, sign * q, atol=1e-8)
        assert q_back[0] >= 0

        # axis_angle2quat + quat2Vel round-trip (angle in (0, pi)).
        axis = rng.normal(size=3)
        axis /= np.linalg.norm(axis)
        angle = rng.uniform(0.1, 3.0)
        qa = Q.axis_angle2quat(jnp.asarray(axis), jnp.asarray(angle))
        speed, ax = Q.quat2Vel(qa)
        assert np.allclose(float(speed), angle, atol=1e-8)
        assert np.allclose(np.asarray(ax), axis, atol=1e-8)

        # quatDiff2Vel(q1 -> q2) recovers the relative rotation rate.
        dq = Q.axis_angle2quat(jnp.asarray(axis), jnp.asarray(angle))
        q2 = Q.mulQuat(dq, qj)
        speed, ax = Q.quatDiff2Vel(qj, q2, dt=2.0)
        assert np.allclose(float(speed), angle / 2.0, atol=1e-8)

        # euler2mat consistent with quat2mat(euler2quat(e)).
        e = rng.uniform(-2, 2, 3)
        m1 = np.asarray(Q.euler2mat(jnp.asarray(e)))
        m2 = np.asarray(Q.quat2mat(Q.euler2quat(jnp.asarray(e))))
        assert np.allclose(m1, m2, atol=1e-10)
