"""Differential validation of the MJCF front-end against the mujoco oracle.

Every numeric model field my builder produces is compared against what
mujoco 3.x compiles from the same (sanitized) reference XML.  Reference
assets: `mj_envs_vision/hand_manipulation_suite/assets/DAPG_*.xml`.
"""
import numpy as np
import pytest

from conftest import requires_mujoco, requires_reference

pytestmark = [requires_mujoco, requires_reference]

TASKS = ["hammer", "door", "pen", "relocate"]


@pytest.fixture(scope="module", params=TASKS)
def pair(request):
    from mj_envs_tpu.mjcf import oracle, builder
    om = oracle.load_oracle(request.param)
    m = builder.build_from_xml(oracle.task_xml_path(request.param))
    return m, om, request.param


def _close(a, b, tol=1e-12):
    a, b = np.asarray(a, dtype=np.float64), np.asarray(b, dtype=np.float64)
    assert a.shape == b.shape, f"shape {a.shape} vs {b.shape}"
    if a.size:
        np.testing.assert_allclose(a, b, rtol=0, atol=tol)


def test_sizes(pair):
    m, om, _ = pair
    s = m.spec
    assert (s.nq, s.nv, s.nu) == (om.nq, om.nv, om.nu)
    assert s.nbody == om.nbody
    assert s.njnt == om.njnt
    assert s.ngeom == om.ngeom
    assert s.nsite == om.nsite
    assert s.nten == om.ntendon
    assert s.nsensor == om.nsensor
    assert int(s.pair_explicit.sum()) == om.npair


def test_options(pair):
    m, om, _ = pair
    s = m.spec
    assert s.timestep == om.opt.timestep
    assert s.iterations == om.opt.iterations
    assert s.noslip_iterations == om.opt.noslip_iterations
    _close(s.gravity, om.opt.gravity)
    assert om.opt.integrator == 0  # Euler
    assert om.opt.cone == 0        # pyramidal
    assert om.opt.solver == 2      # Newton


def test_bodies(pair):
    m, om, _ = pair
    s = m.spec
    _close(m.body_pos, om.body_pos)
    _close(m.body_quat, om.body_quat, 1e-9)
    _close(m.body_ipos, om.body_ipos, 1e-9)
    _close(m.body_mass, om.body_mass, 1e-9)
    _close(m.body_inertia, om.body_inertia, 1e-9)
    np.testing.assert_array_equal(s.body_parentid, om.body_parentid)
    np.testing.assert_array_equal(s.body_rootid, om.body_rootid)
    np.testing.assert_array_equal(s.body_weldid, om.body_weldid)
    # iquat compared as full world-frame tensors (degenerate eigenvalues
    # make principal frames non-unique, e.g. the table body).
    from mj_envs_tpu.mjcf.parser import quat_to_mat_np
    for b in range(om.nbody):
        Ra = quat_to_mat_np(np.asarray(m.body_iquat)[b])
        Rb = quat_to_mat_np(om.body_iquat[b])
        Ia = Ra @ np.diag(np.asarray(m.body_inertia)[b]) @ Ra.T
        Ib = Rb @ np.diag(om.body_inertia[b]) @ Rb.T
        _close(Ia, Ib, 1e-9)


def test_joints_dofs(pair):
    m, om, _ = pair
    s = m.spec
    np.testing.assert_array_equal(s.jnt_type, om.jnt_type)
    np.testing.assert_array_equal(s.jnt_limited, om.jnt_limited)
    np.testing.assert_array_equal(s.jnt_bodyid, om.jnt_bodyid)
    _close(m.jnt_pos, om.jnt_pos)
    _close(m.jnt_axis, om.jnt_axis, 1e-12)
    _close(m.jnt_range, om.jnt_range)
    _close(m.jnt_margin, om.jnt_margin)
    _close(m.jnt_solref_lim, om.jnt_solref)
    _close(m.jnt_solimp_lim, om.jnt_solimp)
    _close(m.dof_damping, om.dof_damping)
    _close(m.dof_armature, om.dof_armature)
    _close(m.dof_frictionloss, om.dof_frictionloss)
    _close(m.qpos0, om.qpos0)


def test_geoms_sites(pair):
    m, om, _ = pair
    s = m.spec
    np.testing.assert_array_equal(s.geom_type, om.geom_type)
    np.testing.assert_array_equal(s.geom_bodyid, om.geom_bodyid)
    np.testing.assert_array_equal(s.geom_contype, om.geom_contype)
    np.testing.assert_array_equal(s.geom_conaffinity, om.geom_conaffinity)
    np.testing.assert_array_equal(s.geom_condim, om.geom_condim)
    _close(m.geom_pos, om.geom_pos)
    _close(np.abs(m.geom_quat), np.abs(om.geom_quat), 1e-9)
    _close(m.geom_size, om.geom_size)
    _close(m.site_pos, om.site_pos)
    _close(np.abs(m.site_quat), np.abs(om.site_quat), 1e-9)
    np.testing.assert_array_equal(s.site_bodyid, om.site_bodyid)


def test_actuators_tendons(pair):
    m, om, _ = pair
    _close(m.act_gainprm, om.actuator_gainprm)
    _close(m.act_biasprm, om.actuator_biasprm)
    _close(m.act_ctrlrange, om.actuator_ctrlrange)
    np.testing.assert_array_equal(m.spec.act_trnid, om.actuator_trnid[:, 0])
    _close(m.ten_range, om.tendon_range)
    W = np.zeros((om.ntendon, om.nv))
    for t in range(om.ntendon):
        adr, num = om.tendon_adr[t], om.tendon_num[t]
        for w in range(adr, adr + num):
            W[t, om.wrap_objid[w]] = om.wrap_prm[w]
    _close(m.ten_coef, W)


def test_invweights(pair):
    m, om, _ = pair
    _close(m.dof_invweight0, om.dof_invweight0, 1e-8)
    _close(m.body_invweight0, om.body_invweight0, 1e-8)
    _close(m.ten_invweight0, om.tendon_invweight0, 1e-8)


def test_invweight_disk_cache_roundtrip(pair):
    """The invweight disk cache (mj_setConst results keyed by model
    content, builder._set_invweights) must hold exactly what the build
    produced — a later cache-hit build then gets bit-identical values
    (and test_invweights above gates them against the oracle)."""
    import os
    from mj_envs_tpu.mjcf import builder
    m, _, _ = pair
    # A build is served from (in priority order) the .jax_cache copy or
    # the committed asset copy; a miss on both computes and writes the
    # .jax_cache copy.  Whichever exists must hold the build's values.
    candidates = [builder._invweight_cache_path(m),
                  builder._invweight_asset_path(m)]
    path = next((p for p in candidates if os.path.exists(p)), None)
    assert path is not None, "build should have an on-disk invweight copy"
    with np.load(path) as z:
        _close(m.dof_invweight0, z["dof"], 0)
        _close(m.body_invweight0, z["body"], 0)
        _close(m.ten_invweight0, z["ten"], 0)


def test_explicit_pair_params(pair):
    m, om, _ = pair
    s = m.spec
    ex = s.pair_explicit
    _close(np.asarray(m.pair_solref)[ex], om.pair_solref)
    _close(np.asarray(m.pair_solimp)[ex], om.pair_solimp)
    _close(np.asarray(m.pair_margin)[ex], om.pair_margin)
    _close(np.asarray(m.pair_friction)[ex], om.pair_friction)
    np.testing.assert_array_equal(s.pair_condim[ex], om.pair_dim)
    # geom ids (order within pair may be swapped by type sorting)
    mine = {tuple(sorted((int(a), int(b))))
            for a, b in zip(s.pair_geom1[ex], s.pair_geom2[ex])}
    theirs = {tuple(sorted((int(om.pair_geom1[i]), int(om.pair_geom2[i]))))
              for i in range(om.npair)}
    assert mine == theirs


def test_names(pair):
    import mujoco
    m, om, _ = pair
    s = m.spec
    for kind, objtype in [
        ("body", mujoco.mjtObj.mjOBJ_BODY),
        ("joint", mujoco.mjtObj.mjOBJ_JOINT),
        ("geom", mujoco.mjtObj.mjOBJ_GEOM),
        ("site", mujoco.mjtObj.mjOBJ_SITE),
        ("actuator", mujoco.mjtObj.mjOBJ_ACTUATOR),
        ("sensor", mujoco.mjtObj.mjOBJ_SENSOR),
    ]:
        for name, idx in s.names[kind].items():
            assert mujoco.mj_name2id(om, objtype, name) == idx, (kind, name)


def test_vendored_assets_build_identical():
    """The vendored single-file XMLs (`mj_envs_tpu/assets/`, written by
    tools/extract_assets.py) must build the exact same Model pytree as
    the reference include-graph XMLs — the framework is self-contained
    at runtime, with the reference needed only for oracle tests."""
    import os
    import jax
    from mj_envs_tpu.mjcf import (builder, oracle,
                                  task_xml_path, VENDORED_ASSETS)
    for task in TASKS:
        vendored = os.path.join(VENDORED_ASSETS, oracle.TASK_XML[task])
        if not os.path.exists(vendored):
            pytest.skip("vendored assets not extracted")
        assert task_xml_path(task) == vendored
        mv = builder.build_from_xml(vendored)
        mr = builder.build_from_xml(oracle.task_xml_path(task))
        lv, tv = jax.tree_util.tree_flatten(mv)
        lr, tr = jax.tree_util.tree_flatten(mr)
        # ModelSpec hashes by identity (jit-cache key), so the treedefs
        # can't compare equal; compare the spec contents structurally.
        assert len(lv) == len(lr)
        sv, sr = mv.spec.__dict__, mr.spec.__dict__
        assert set(sv) == set(sr)
        for k in sv:
            a, b = sv[k], sr[k]
            if isinstance(a, np.ndarray):
                np.testing.assert_array_equal(a, b, err_msg=f"spec.{k}")
            else:
                assert a == b, f"spec.{k}: {a!r} != {b!r}"
        for a, b in zip(lv, lr):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_invweight_assets_committed():
    """Cold-clone `envs.make()` must never recompute invweights in-process
    on a TPU host (one fresh mj_setConst compile through the axon tunnel
    measured 343 s in round 3): the committed package-data npz under
    mj_envs_tpu/assets/invweights/ must cover every task at both runtime
    dtypes.  If a model or invweight-math change rolls the content hash,
    rerun `python tools/gen_invweights.py` (with JAX_ENABLE_X64=1)."""
    import os
    from mj_envs_tpu.mjcf import builder, task_xml_path
    for task in TASKS:
        for dtype in (np.float32, np.float64):
            m = builder.build_from_xml(task_xml_path(task), dtype=dtype)
            path = builder._invweight_asset_path(m)
            assert os.path.exists(path), (
                f"missing committed invweights for {task}/{np.dtype(dtype).name}:"
                f" {path} — run tools/gen_invweights.py")
