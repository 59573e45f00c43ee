"""Env API semantics that have no oracle counterpart: in-graph
auto-reset (brax/gymnax convention — fresh obs after a boundary, terminal
reward/done surfaced to the learner) and non-finite state quarantine
(SURVEY §5 failure-detection row).
"""
import numpy as np

import jax
import jax.numpy as jnp

from mj_envs_tpu import envs


def _short_cap_env(task="hammer-v0", cap=3):
    env = envs.make(task)
    env.MAX_EPISODE_STEPS = cap   # instance attr shadows the class attr
    return env


def test_auto_reset_on_truncation():
    """At the episode cap the returned state is the FRESH episode
    (step_count 0, reset obs), reward reports the finishing step, and
    done marks the boundary (brax convention — the returned obs is the
    next episode's, so bootstrap must be cut here)."""
    env = _short_cap_env(cap=2)
    st = jax.jit(env.reset)(jax.random.PRNGKey(0))
    step = jax.jit(env.step_auto_reset)
    a = jnp.zeros(env.nu)
    st1 = step(st, a)
    assert int(st1.step_count) == 1
    assert not bool(st1.done)          # mid-episode: no boundary
    st2 = step(st1, a)
    # boundary: step_count hit 2 == cap -> restarted
    assert int(st2.step_count) == 0
    assert bool(st2.done)              # truncation boundary reported
    assert bool(st2.truncated)         # ...flagged as cap, not task end
    # final_obs carries the finishing step's obs for V-bootstrap; it
    # must differ from the fresh obs the state now exposes
    assert not np.allclose(np.asarray(st2.final_obs), np.asarray(st2.obs))
    # fresh obs: qvel-derived entries are zero again and obs matches a
    # hand-rolled reset with the key the state carried.
    fresh = jax.jit(env.reset)(st1.key)
    np.testing.assert_allclose(np.asarray(st2.obs), np.asarray(fresh.obs),
                               rtol=0, atol=0)


def test_nan_quarantine():
    """A poisoned (non-finite) physics state is auto-reset in one step:
    finite fresh state out, reward zeroed, done=True, counter bumped."""
    env = _short_cap_env(cap=200)
    st = jax.jit(env.reset)(jax.random.PRNGKey(1))
    bad = st.replace(data=st.data.replace(
        qvel=st.data.qvel.at[0].set(jnp.nan)))
    step = jax.jit(env.step_auto_reset)
    out = step(bad, jnp.zeros(env.nu))
    assert bool(out.done)
    assert float(out.reward) == 0.0
    assert int(out.nan_resets) == 1
    assert np.all(np.isfinite(np.asarray(out.obs)))
    assert np.all(np.isfinite(np.asarray(out.data.qpos)))
    assert int(out.step_count) == 0
    # and the quarantined env keeps stepping finitely afterwards
    out2 = step(out, jnp.zeros(env.nu))
    assert np.all(np.isfinite(np.asarray(out2.obs)))
    assert int(out2.nan_resets) == 1


def test_nan_quarantine_vmapped_isolation():
    """Only the poisoned env in a batch restarts; neighbours keep their
    trajectory."""
    env = _short_cap_env(cap=200)
    B = 4
    st = jax.jit(jax.vmap(env.reset))(
        jax.random.split(jax.random.PRNGKey(2), B))
    qvel = st.data.qvel.at[1, 0].set(jnp.nan)
    st = st.replace(data=st.data.replace(qvel=qvel))
    out = jax.jit(jax.vmap(env.step_auto_reset))(
        st, jnp.zeros((B, env.nu)))
    nan_resets = np.asarray(out.nan_resets)
    assert nan_resets.tolist() == [0, 1, 0, 0]
    assert np.asarray(out.step_count).tolist() == [1, 0, 1, 1]
    assert np.all(np.isfinite(np.asarray(out.obs)))


def test_hammer_variation_var_fields():
    """ModelVar carries ONLY the fields a task randomizes (sparse — an
    unused field would push the physics onto batched-model paths);
    hammer's variation_type extends the set, with reference bounds
    (`hammer_v0.py:111-129`)."""
    B = 16
    keys = jax.random.split(jax.random.PRNGKey(5), B)

    env = envs.make("hammer-v0")
    var = jax.vmap(lambda k: env._reset_var(env.base_var(), k))(keys)
    assert var.body_pos is not None and var.body_mass is None \
        and var.geom_size is None and var.geom_pos is None

    env = envs.make("hammer-v0", variation_type="mass")
    var = jax.vmap(lambda k: env._reset_var(env.base_var(), k))(keys)
    m = np.asarray(var.body_mass)[:, env.obj_bid]
    assert var.geom_rgba is not None
    assert m.min() >= 0.05 and m.max() <= 2.5 and m.std() > 0.1

    env = envs.make("hammer-v0", variation_type="size")
    var = jax.vmap(lambda k: env._reset_var(env.base_var(), k))(keys)
    r = np.asarray(var.geom_size)[:, env.head_gid, 0]
    assert r.min() >= 0.01 and r.max() <= 0.04 and r.std() > 1e-3
    # and the batched-size physics path steps finitely
    st = jax.jit(jax.vmap(env.reset))(keys)
    st = jax.jit(jax.vmap(env.step))(st, jnp.zeros((B, env.nu)))
    assert np.all(np.isfinite(np.asarray(st.obs)))

    env = envs.make("hammer-v0", variation_type="pos")
    var = jax.vmap(lambda k: env._reset_var(env.base_var(), k))(keys)
    x = np.asarray(var.geom_pos)[:, env.head_gid, 0]
    assert x.min() >= -0.24 and x.max() <= -0.10 and x.std() > 1e-3


def test_compact_batched_matches_unbatched():
    """The vmapped collide path compacts contacts via one-hot MXU
    contractions (_compact_batched); active slots must match the
    unbatched gather-based compact() bit-for-bit, on states with real
    contact sets (settled hammer scenes)."""
    from mj_envs_tpu.physics import pipeline
    from mj_envs_tpu.physics import kinematics as K
    from mj_envs_tpu.physics.collision import driver as C

    env = envs.make("hammer-v0")
    m = env.model
    ncmax = pipeline._ncmax(m.spec)
    B = 5
    st = jax.jit(jax.vmap(env.reset))(
        jax.random.split(jax.random.PRNGKey(4), B))
    step = jax.jit(jax.vmap(env.step))
    for _ in range(10):   # settle into contact-rich states
        st = step(st, jnp.zeros((B, env.nu)))

    kin_b = jax.jit(jax.vmap(lambda q: K.kinematics(m, q)))(st.data.qpos)
    _, cc_b = jax.jit(
        jax.vmap(lambda k: C.collide(m, k, ncmax)))(kin_b)

    for i in range(B):
        kin = jax.tree.map(lambda x: x[i], kin_b)
        _, cc = jax.jit(lambda k: C.collide(m, k, ncmax))(kin)
        act = np.asarray(cc.active)
        assert act.sum() >= 2, "settled state should have contacts"
        np.testing.assert_array_equal(act, np.asarray(cc_b.active[i]))
        for field in ("pairid", "geom1", "geom2", "condim"):
            np.testing.assert_array_equal(
                np.asarray(getattr(cc, field))[act],
                np.asarray(getattr(cc_b, field)[i])[act], err_msg=field)
        for field in ("dist", "pos", "frame"):
            np.testing.assert_array_equal(
                np.asarray(getattr(cc, field))[act],
                np.asarray(getattr(cc_b, field)[i])[act], err_msg=field)


def test_contact_overflow_indicator():
    """compact() drops contacts beyond the ncmax active slots; the env
    must FLAG that instead of silently diverging (VERDICT r2 item 8).
    Self-calibrating: measure the trajectory's peak narrowphase contact
    count at the default cap (no clipping), then rebuild with a cap one
    below the peak and assert the clip counter fires."""
    env = envs.make("hammer-v0")
    st = jax.jit(env.reset)(jax.random.PRNGKey(3))
    step = jax.jit(env.step)
    a = jnp.zeros(env.nu)
    peak = 0
    for _ in range(25):
        st = step(st, a)
        peak = max(peak, int(st.data.ncon_active))
    assert int(st.contact_clips) == 0       # default cap: nothing dropped
    assert peak >= 2, f"settle trajectory only reached {peak} contacts"

    tight = envs.make("hammer-v0")
    tight.spec.ncon_active_cap = peak - 1   # read by pipeline._ncmax
    tight.ncmax = peak - 1
    st = jax.jit(tight.reset)(jax.random.PRNGKey(3))
    step = jax.jit(tight.step)
    for _ in range(25):
        st = step(st, a)
    assert int(st.contact_clips) > 0
    # and the auto-reset path carries the counter through
    st2 = jax.jit(tight.step_auto_reset)(st, a)
    assert int(st2.contact_clips) >= int(st.contact_clips)


def test_chunked_vmap_matches_plain_vmap():
    """parallel.vector.chunked_vmap is a SCHEDULING change: per-env math
    is identical, but the Newton while_loop's batch-wide early exit runs
    a few extra iterations on the bigger batch (it iterates until ALL
    envs converge), refining already-converged values below the solver
    tolerance.  Measured deltas on CPU f32: qacc ~7e-4 abs, qvel ~5e-6,
    obs ~1.4e-7 — bounded here at solver-tolerance scale; int/bool
    leaves (done, counters, keys) must match exactly."""
    from mj_envs_tpu.parallel.vector import chunked_vmap
    env = envs.make("hammer-v0")
    B = 8
    keys = jax.random.split(jax.random.PRNGKey(11), B)
    st = jax.jit(jax.vmap(env.reset))(keys)
    a = jax.random.uniform(jax.random.PRNGKey(12), (B, env.nu),
                           jnp.float32, -1.0, 1.0)
    plain = jax.jit(jax.vmap(env.step_auto_reset))(st, a)
    chunk = jax.jit(chunked_vmap(env.step_auto_reset, 2))(st, a)
    for f, (x, y) in enumerate(zip(jax.tree.leaves(plain),
                                   jax.tree.leaves(chunk))):
        x, y = np.asarray(x), np.asarray(y)
        if x.dtype.kind == "f":
            assert np.allclose(x, y, rtol=1e-3, atol=2e-3), f
        else:
            assert np.array_equal(x, y), f
