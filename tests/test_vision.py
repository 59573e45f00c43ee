"""Vision-stack tests: camera-pose parity vs the reference formula on
oracle data, golden-image regression for the rasterizer, pixel-env smoke
under jit/vmap, one PlaNet update step, replay ring-buffer semantics.

Reference contracts: `headless_observer.py:26-31,59-67` (camera az/el/
dist), `utils/wrappers.py:32-76` (state+pixels), Kaixhin PlaNet memory /
`train.py:122` (bit-depth chain).
"""
import os

import numpy as np
import pytest

from conftest import requires_mujoco, requires_reference

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")


def _make_pixel_env(task="hammer-v0"):
    from mj_envs_tpu import envs
    from mj_envs_tpu.envs.pixels import PixelObservationEnv
    return PixelObservationEnv(envs.make(task))


@requires_mujoco
@requires_reference
@pytest.mark.parametrize("task", ["hammer", "door"])
def test_camera_elevation_parity(task):
    """Our elevation must equal the reference formula
    `-45 + deg(arccos(lookat_x / lookat_z)) / 2` evaluated on ORACLE
    body_xpos / cam_xpos data (`headless_observer.py:59-67`), with the
    reference's pre-resolution lookat body quirk (hammer: last body;
    others: world) preserved."""
    import mujoco
    from mj_envs_tpu.mjcf import oracle as O

    mm = mujoco.MjModel.from_xml_string(O.sanitize(O.task_xml_path(task)))
    md = mujoco.MjData(mm)
    mujoco.mj_forward(mm, md)
    bid = mm.nbody - 1 if task == "hammer" else 0
    lookatv = md.xpos[bid] - md.cam_xpos[mm.ncam - 1]
    ratio = lookatv[0] / lookatv[2]
    want = -45.0 + np.degrees(np.arccos(np.clip(ratio, -1, 1))) / 2.0

    penv = _make_pixel_env(f"{task}-v0")
    assert abs(penv.elevation - want) < 1e-3, (penv.elevation, want)
    assert penv.azimuth == 90.0 and penv.distance == 4.5


def test_raster_golden_image():
    """Golden-image regression: hammer scene at qpos0 rendered 64x64.
    Regenerate with tools/gen_golden.py when the renderer intentionally
    changes."""
    import jax
    penv = _make_pixel_env()
    st = jax.jit(penv.reset)(jax.random.PRNGKey(0))
    img = np.asarray(st.pixels)
    assert img.shape == (64, 64, 3)
    assert img.dtype == np.float32
    assert img.min() >= 0.0 and img.max() <= 255.0
    # scene is non-trivial: some geometry hit, some sky
    assert img.std() > 5.0
    path = os.path.join(GOLDEN_DIR, "raster_hammer64.npy")
    if not os.path.exists(path):
        os.makedirs(GOLDEN_DIR, exist_ok=True)
        np.save(path, img)
        pytest.skip("golden image written (first run)")
    golden = np.load(path)
    assert np.abs(img - golden).max() < 2.0, (
        "rendered image deviates from golden; regenerate deliberately "
        "if the renderer changed")


def test_pixels_env_smoke_jit_vmap():
    """reset/step under jit; vmapped reset; both state and pixels
    exposed (reference wrapper get_pixels/get_state, wrappers.py:72-76)."""
    import jax
    import jax.numpy as jnp
    penv = _make_pixel_env()
    env = penv.env
    ps = jax.jit(penv.reset)(jax.random.PRNGKey(1))
    assert ps.pixels.shape == (64, 64, 3)
    assert penv.get_state(ps).shape == (env.OBS_DIM,)
    ps2 = jax.jit(penv.step)(ps, jnp.zeros(env.nu))
    assert np.all(np.isfinite(np.asarray(ps2.pixels)))
    assert float(jnp.abs(ps2.pixels - ps.pixels).max()) >= 0.0

    v_reset = jax.jit(jax.vmap(penv.reset))
    batch = v_reset(jax.random.split(jax.random.PRNGKey(2), 2))
    assert batch.pixels.shape == (2, 64, 64, 3)
    # hammer board height is randomized per env -> images differ
    assert not np.allclose(np.asarray(batch.pixels[0]),
                           np.asarray(batch.pixels[1]))


def test_planet_update_step():
    """One gradient step on a tiny RSSM: loss finite, params change
    (reference Planet.update semantics, baselines.py:268-302)."""
    import jax
    import jax.numpy as jnp
    from mj_envs_tpu.algos import planet as PL

    cfg = PL.PlanetConfig(belief_size=16, state_size=4, hidden_size=16,
                          embedding_size=32, action_size=3,
                          planning_horizon=3, optimisation_iters=2,
                          candidates=8, top_candidates=3)
    init_fn, update_fn, infer_step, plan = PL.make_planet(cfg)
    key = jax.random.PRNGKey(0)
    params, opt_state = init_fn(key)

    T, B = 4, 2
    batch = {
        "obs": jax.random.uniform(key, (T, B, 64, 64, 3)) - 0.5,
        "actions": jax.random.uniform(key, (T, B, 3), minval=-1.0),
        "rewards": jax.random.uniform(key, (T, B)),
        "nonterminals": jnp.ones((T, B)),
    }
    params2, opt_state2, metrics = jax.jit(update_fn)(
        params, opt_state, key, batch)
    for k, v in metrics.items():
        assert np.isfinite(float(v)), (k, v)
    diff = jax.tree_util.tree_reduce(
        lambda acc, ab: acc + float(jnp.abs(ab).sum()),
        jax.tree_util.tree_map(lambda a, b: a - b, params, params2), 0.0)
    assert diff > 0.0, "update did not change parameters"

    # act path: infer + plan produce a clipped action
    h = jnp.zeros((1, cfg.belief_size))
    s = jnp.zeros((1, cfg.state_size))
    a = jnp.zeros((1, cfg.action_size))
    obs = jax.random.uniform(key, (1, 64, 64, 3)) - 0.5
    h, s = jax.jit(infer_step)(params2, key, h, s, a, obs)
    act = jax.jit(plan)(params2, key, h, s)
    assert act.shape == (1, cfg.action_size)
    assert np.all(np.abs(np.asarray(act)) <= 1.0 + 1e-6)


def test_replay_ring_semantics():
    """Ring wrap, write-head rejection, episode/step counters, and the
    quantize/dequantize bit-depth chain (Kaixhin memory semantics)."""
    from mj_envs_tpu.algos.replay import (ExperienceReplay, quantize_obs,
                                          dequantize_obs)

    size, H = 10, 4
    mem = ExperienceReplay(size, (H, H, 3), 2, bit_depth=5, seed=0)
    rng = np.random.default_rng(0)
    for t in range(17):              # wraps the ring
        obs = rng.uniform(0, 255, (H, H, 3))
        mem.append(obs, rng.uniform(-1, 1, 2), float(t),
                   done=(t % 5 == 4))
    assert mem.steps == 17
    assert mem.episodes == 3
    assert mem.full and mem.idx == 17 % size

    batch = mem.sample(6, 4)
    assert batch["obs"].shape == (4, 6, H, H, 3)
    assert batch["rewards"].shape == (4, 6)
    # sampled chunks are consecutive modulo the ring and never straddle
    # the write head: reconstruct indices from rewards (reward == t).
    rew = batch["rewards"]
    for b in range(rew.shape[1]):
        ts = rew[:, b].astype(int)
        assert np.all(np.diff(ts) == 1), ts
        # none of the chunk's non-first elements is the write head
        head_t = 16  # latest written t is 16 at idx (17-1)%10
        assert mem.idx not in [int(t) % size for t in ts[1:]]

    # bit-depth chain: quantize floors to 8 levels at depth 3
    x = np.arange(0, 256, dtype=np.float64).reshape(16, 16)
    q = quantize_obs(x, 3)
    assert set(np.unique(q)) <= {i * 32 for i in range(8)}
    d = dequantize_obs(q, 3, np.random.default_rng(0))
    assert d.min() >= -0.5 and d.max() <= 0.5 + 1e-6


def test_images_to_observation_matches_replay_chain():
    """On-device preprocessing (render/raster.images_to_observation) must
    equal the replay's dequantize applied to a quantized store, modulo
    the uniform noise term (reference train.py:122 / env preprocess)."""
    import jax.numpy as jnp
    from mj_envs_tpu.render.raster import images_to_observation
    from mj_envs_tpu.algos.replay import quantize_obs, dequantize_obs

    rng = np.random.default_rng(1)
    img = rng.uniform(0, 255, (8, 8, 3))
    ours = np.asarray(images_to_observation(jnp.asarray(img), 5))
    # noise-free replay chain
    q = quantize_obs(img, 5)
    ref = np.floor_divide(q.astype(np.float32), 2 ** 3) / 2 ** 5 - 0.5
    assert np.abs(ours - ref).max() < 1e-6


def _write_cube_stl(path, half=1.0):
    """Binary STL of an axis-aligned cube [-half, half]^3 (12 tris)."""
    import struct
    v = np.array([[sx, sy, sz] for sx in (-half, half)
                  for sy in (-half, half) for sz in (-half, half)],
                 np.float32)
    # faces as vertex-index triples, outward winding per axis pair
    quads = [(0, 1, 3, 2), (4, 6, 7, 5),    # x- x+
             (0, 4, 5, 1), (2, 3, 7, 6),    # y- y+
             (0, 2, 6, 4), (1, 5, 7, 3)]    # z- z+
    tris = []
    for a, b, c, d in quads:
        tris += [(a, b, c), (a, c, d)]
    with open(path, "wb") as f:
        f.write(b"\0" * 80)
        f.write(struct.pack("<I", len(tris)))
        for t in tris:
            f.write(struct.pack("<3f", 0, 0, 0))          # normal (unused)
            for i in t:
                f.write(struct.pack("<3f", *v[i]))
            f.write(struct.pack("<H", 0))


def test_mesh_render_matches_analytic_box(tmp_path):
    """Mesh path (STL -> MeshBank -> Möller-Trumbore in render) must
    reproduce the analytic box: hide a box geom in the hammer scene and
    re-render with an identical cube mesh instance at the same pose.

    This is the §2.9 capability test — the shipped tasks themselves use
    no meshes because the Adroit STL submodule is broken upstream."""
    import jax
    import jax.numpy as jnp
    from mj_envs_tpu import envs
    from mj_envs_tpu.envs.pixels import PixelObservationEnv
    from mj_envs_tpu.physics.model import GEOM_BOX
    from mj_envs_tpu.render import raster
    from mj_envs_tpu.render.mesh import load_stl, MeshBank

    penv = PixelObservationEnv(envs.make("hammer-v0"))
    env = penv.env
    model = env.model
    s = model.spec

    # first visible box geom (the table top)
    rgba = np.asarray(model.geom_rgba)
    gids = [g for g in np.nonzero(np.asarray(s.geom_type) == GEOM_BOX)[0]
            if rgba[g, 3] > 0.05]
    assert gids, "hammer scene should contain a visible box"
    g = int(gids[0])

    st = env.reset(jax.random.PRNGKey(0))
    xpos, xmat = st.data.geom_xpos, st.data.geom_xmat
    cam = penv.camera

    img_box = np.asarray(raster.render(model, xpos, xmat, cam, 128, 128))

    # replace geom g with an equivalent unit-cube mesh scaled by its size
    stl = tmp_path / "cube.stl"
    _write_cube_stl(stl, half=1.0)
    verts, faces = load_stl(str(stl))
    assert faces.shape == (12, 3) and verts.shape == (8, 3)
    size = np.asarray(model.geom_size)[g]
    bank = MeshBank.pack([(verts * size[None, :], faces)])
    inst = raster.MeshInstances(
        bank=bank, meshid=np.array([0]),
        pos=xpos[g][None], mat=xmat[g][None],
        rgba=jnp.asarray(rgba[g][None]))

    hidden = model.replace(geom_rgba=model.geom_rgba.at[g, 3].set(0.0))
    img_mesh = np.asarray(raster.render(
        hidden, xpos, xmat, cam, 128, 128, meshes=inst))

    # identical geometry: images equal except argmin tie-break pixels
    # at silhouette edges
    diff = np.abs(img_box - img_mesh).max(axis=-1)
    frac_off = (diff > 2.0).mean()
    assert frac_off < 0.005, f"{frac_off:.4f} of pixels differ"


@pytest.mark.slow
def test_planet_end_to_end_smoke_completes():
    """The full PlaNet loop (seed -> replay -> RSSM updates -> CEM
    collection) terminates and reports finite losses.  Regression guard
    for the seed-loop hang: hammer never sets done, so episode
    boundaries must be marked at rollout end or `mem.episodes` never
    reaches seed_episodes (tools/planet_smoke.py timed out >1 h on
    exactly this).  Runs as a subprocess with a hard timeout so a
    reintroduced hang fails instead of wedging CI."""
    import json
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = subprocess.run(
        [sys.executable, os.path.join(repo, "tools", "planet_smoke.py")],
        capture_output=True, text=True, cwd=repo, timeout=2400)
    assert out.returncode == 0, out.stdout[-2000:] + out.stderr[-2000:]
    last = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    rec = json.loads(last)
    assert rec["task"] == "hammer-v0"
    assert all(np.isfinite(v) for v in rec["final"].values()), rec


def test_cnn_actor_critic_shapes():
    """NatureCNN torso on 64x64x3: output shapes, uint8/f32 input
    equivalence (the torso rescales in-graph), finite values."""
    import jax
    import jax.numpy as jnp
    from mj_envs_tpu.algos import networks as N

    params = N.cnn_actor_critic_init(jax.random.PRNGKey(0), act_dim=5)
    pix_f = jax.random.uniform(jax.random.PRNGKey(1), (3, 64, 64, 3),
                               jnp.float32, 0.0, 255.0)
    mean, log_std, value = jax.jit(N.cnn_actor_critic_apply)(params, pix_f)
    assert mean.shape == (3, 5) and value.shape == (3,)
    assert log_std.shape == (5,)
    assert np.all(np.isfinite(np.asarray(mean)))
    # uint8 input == its float cast (integer-valued pixels)
    pix_u8 = jnp.round(pix_f).astype(jnp.uint8)
    m2, _, v2 = jax.jit(N.cnn_actor_critic_apply)(params, pix_u8)
    m3, _, v3 = jax.jit(N.cnn_actor_critic_apply)(
        params, pix_u8.astype(jnp.float32))
    np.testing.assert_allclose(np.asarray(m2), np.asarray(m3), atol=1e-6)
    # leading (T, B) batch dims flatten correctly
    m4 = N.cnn_actor_critic_apply(params, pix_f.reshape(1, 3, 64, 64, 3))[0]
    np.testing.assert_allclose(np.asarray(m4[0]), np.asarray(mean),
                               atol=1e-6)


def test_pixel_ppo_train_iter_smoke():
    """One jitted pixel-PPO iteration (VERDICT r2 item 5: the reference's
    `model_type == "cnn"` ActorCriticCnnPolicy family,
    `mj_envs_vision/algos/baselines.py:120-134`): rollout renders
    on-device, losses finite, params move."""
    import jax
    import jax.numpy as jnp
    from mj_envs_tpu import envs
    from mj_envs_tpu.envs.pixels import PixelObservationEnv
    from mj_envs_tpu.algos import ppo as PPO

    env = envs.make("hammer-v0")
    env.MAX_EPISODE_STEPS = 2         # force a truncation boundary in-roll
    penv = PixelObservationEnv(env)
    cfg = PPO.PPOConfig(n_steps=3, n_minibatches=2, n_epochs=1)
    B = 2
    init_fn, train_iter_fn, act_fn = PPO.make_pixel_ppo(penv, B, cfg)
    ts = init_fn(jax.random.PRNGKey(0))
    ps = jax.jit(jax.vmap(penv.reset))(
        jax.random.split(jax.random.PRNGKey(1), B))
    ts2, ps2, metrics = jax.jit(train_iter_fn)(ts, ps)
    for k, v in metrics.items():
        assert np.isfinite(float(v)), (k, v)
    assert ps2.pixels.shape == (B, 64, 64, 3)
    diff = jax.tree_util.tree_reduce(
        lambda acc, ab: acc + float(jnp.abs(ab).sum()),
        jax.tree_util.tree_map(lambda a, b: a - b, ts.params, ts2.params),
        0.0)
    assert diff > 0.0, "pixel PPO update did not change parameters"


def test_planet_evaluate_protocol():
    """`make_planet_evaluate` (VERDICT r2 item 6: the reference
    evaluates PlaNet like any policy, eval.py:36-44) runs the
    belief-filtered CEM act path batched over eval envs and returns the
    standard EvalResult."""
    import jax
    from mj_envs_tpu import envs
    from mj_envs_tpu.algos import planet as PL
    from mj_envs_tpu.utils.config import PlanetConfig as RunPlanetConfig
    from mj_envs_tpu.utils.eval import make_planet_evaluate

    config = RunPlanetConfig()
    config.belief_size, config.state_size = 16, 4
    config.hidden_size, config.embedding_size = 16, 32
    config.candidates, config.top_candidates = 8, 3
    config.optimisation_iters, config.planning_horizon = 2, 3
    config.max_episode_length, config.action_repeat = 4, 2

    env = envs.make("pen-v0")
    cfg = PL.cfg_from_config(config, env.nu)
    init_fn, _, _, _ = PL.make_planet(cfg)
    params, _ = init_fn(jax.random.PRNGKey(0))

    evaluate = make_planet_evaluate(env, config, episode_length=2)
    res = evaluate(params, jax.random.PRNGKey(1), count=2)
    assert res.reward.shape == (2, 2)
    assert res.qpos.shape == (2, 2, env.nq)
    assert np.all(np.isfinite(res.total_rewards))
    assert 0.0 <= res.success_rate <= 100.0
