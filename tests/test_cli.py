"""CLI-layer protocol tests.

The eval CLI must follow the reference protocol
(`mj_envs_vision/utils/eval.py:29-66`): per-episode reseed `seed + ep`,
worst-trajectory gif per episode, reward + success plots at the end.
The visualize CLI (`visualize_env.py:109-140`) must sniff the policy
type and write `visualise_<env>_<policy>_<k>.gif` + a rewards plot.

The batched rollout and the renderer are stubbed here — these tests
exercise the CLI plumbing (seeding, artifact naming/writing, policy
dispatch), not physics; the rollout/render internals are covered by
test_env_parity.py / test_vision.py.
"""
import json
import os

import numpy as np
import pytest

import jax


def test_eval_cli_protocol(tmp_path, monkeypatch):
    from mj_envs_tpu.utils import eval as E
    from mj_envs_tpu import visualize as V

    seen_keys = []

    def fake_make_evaluate(env, apply, episode_length, deterministic=True):
        nq = env.model.qpos0.shape[0]

        def evaluate(params, key, count=10):
            seen_keys.append(np.asarray(key).copy())
            T = 4
            rng = np.random.default_rng(len(seen_keys))
            rew = rng.normal(size=(count, T))
            goal = np.zeros((count, T), bool)
            return E.EvalResult(
                total_rewards=rew.sum(1),
                success_any=goal.any(1),
                success_rate=0.0,
                goal_achieved=goal,
                obs=np.zeros((count, T, 3), np.float32),
                qpos=np.zeros((count, T, nq), np.float32),
                reward=rew)

        return evaluate

    def fake_render(env, qpos_traj, height=128, width=128):
        return [np.zeros((8, 8, 3), np.uint8)
                for _ in range(len(qpos_traj))]

    monkeypatch.setattr(E, "make_evaluate", fake_make_evaluate)
    monkeypatch.setattr(V, "render_state_trajectory", fake_render)

    cfg = tmp_path / "cfg.json"
    cfg.write_text(json.dumps({"env_name": "hammer-v0", "seed": 7}))
    out = tmp_path / "results"

    E.run_eval(str(cfg), policy_type="dapg", episodes=2, out=str(out))

    # Reference reseed protocol: episode ep uses PRNGKey(seed + ep).
    assert len(seen_keys) == 2
    for ep, key in enumerate(seen_keys):
        want = np.asarray(jax.random.PRNGKey(7 + ep))
        np.testing.assert_array_equal(key, want)

    files = sorted(os.listdir(out))
    gifs = [f for f in files if f.endswith(".gif")]
    pngs = [f for f in files if f.endswith(".png")]
    assert len(gifs) == 2                    # one worst-trajectory per ep
    assert any("eval_rewards" in f for f in pngs)
    assert any("eval_success" in f for f in pngs)


def test_visualize_cli_artifacts(tmp_path, monkeypatch):
    from click.testing import CliRunner
    from mj_envs_tpu import visualize as V

    def fake_rollout(env, act_fn, key, max_steps):
        frames = [np.zeros((8, 8, 3), np.uint8) for _ in range(3)]
        return frames, [0.5, -0.25]

    monkeypatch.setattr(V, "_rollout_frames", fake_rollout)

    out = tmp_path / "vis"
    res = CliRunner().invoke(V.main, [
        "--env_name", "hammer-v0", "--episodes", "2",
        "--out", str(out)])
    assert res.exit_code == 0, res.output

    files = sorted(os.listdir(out))
    # Policy sniffing: no --policy -> pretrained DAPG golden policy.
    assert "visualise_hammer-v0_dapg-golden_0.gif" in files
    assert "visualise_hammer-v0_dapg-golden_1.gif" in files
    assert "rewards_hammer-v0.png" in files


def test_interactive_viewer_headless_smoke():
    """InteractiveViewer (the reference MjViewer windowed-mode analogue)
    must step, render, and honor MjViewer-style key controls without a
    display (Agg backend never opens a window)."""
    import numpy as np
    from mj_envs_tpu.viewer import InteractiveViewer, VIEWER_CAMS

    v = InteractiveViewer("hammer-v0", backend="Agg", height=64, width=80)
    # reference mj_viewer_setup camera defaults
    assert (v.azimuth, v.distance) == VIEWER_CAMS["hammer"]
    img = v.frame()
    assert img.shape == (64, 80, 3) and np.isfinite(img).all()
    # key controls mutate the camera / run state
    az0, d0 = v.azimuth, v.distance
    v.handle_key("left")
    v.handle_key("+")
    assert v.azimuth == az0 - 10.0 and v.distance < d0
    v.handle_key(" ")
    assert v.paused
    v.handle_key(" ")
    score = v.run(episodes=1, max_steps=3)
    assert np.isfinite(score)
    img2 = v.frame()
    assert np.isfinite(img2).all()
    v.handle_key("q")
    assert v.closed
