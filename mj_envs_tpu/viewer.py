"""Interactive policy viewer — the reference `MjViewer` windowed mode.

The reference opens a GLFW window per env with a per-task free camera
(`mj_viewer_setup`: hammer az=45 dist=2.0, door az=90 dist=1.5, pen
az=-45 dist=1.0, relocate az=90 dist=1.5 —
`mj_envs_vision/hand_manipulation_suite/hammer_v0.py:155-159`,
`door_v0.py:140-144`, `pen_v0.py:154-158`, `relocate_v0.py:131-136`)
and drives it from `utils/visualize_env.py:75-104` (`visualise_policy`,
including the zero-action warm-up freeze).

TPU-native equivalent: frames come from the on-device ray-caster
(`render/raster.py` — no GL/EGL/X server), displayed in a matplotlib
window with MjViewer-style mouse-free keyboard control:

    arrows       rotate (azimuth / elevation)
    + / -        zoom (distance)
    space        pause / resume
    r            reset the episode
    q / escape   close

Headless-safe: with matplotlib's Agg backend (no DISPLAY) `run()`
steps/renders without a window — this is also how the smoke test
drives it.

CLI:  python -m mj_envs_tpu.viewer --env_name hammer-v0 \
          [--policy ckpt.msgpack|dapg.pickle] [--episodes 2]
"""
from __future__ import annotations

import argparse
from typing import Callable, Optional

import numpy as np
import jax
import jax.numpy as jnp

from . import envs
from .envs.base import _apply_var
from .render import raster

# Reference per-task free-camera setups (azimuth_deg, distance).
# MjViewer leaves elevation at mujoco's free-camera default (-45 deg).
VIEWER_CAMS = {
    "hammer": (45.0, 2.0),
    "door": (90.0, 1.5),
    "pen": (-45.0, 1.0),
    "relocate": (90.0, 1.5),
}
DEFAULT_ELEVATION = -45.0


class InteractiveViewer:
    """Windowed (or headless) single-env rollout viewer."""

    def __init__(self, env_name: str,
                 policy: Optional[Callable] = None,
                 height: int = 240, width: int = 320,
                 backend: Optional[str] = None,
                 warmup_steps: int = 0, seed: int = 0):
        import matplotlib
        if backend:
            matplotlib.use(backend)
        import matplotlib.pyplot as plt
        self._plt = plt

        self.env = envs.make(env_name)
        task = self.env.TASK
        self.azimuth, self.distance = VIEWER_CAMS.get(task, (90.0, 2.0))
        self.elevation = DEFAULT_ELEVATION
        self.height, self.width = height, width
        self.policy = policy
        self.warmup_steps = warmup_steps
        self.paused = False
        self.closed = False
        self._key = jax.random.PRNGKey(seed)

        # Camera lookat: median of geom positions at the initial state
        # (the same mujoco-py _init_camera convention envs/pixels.py
        # documents; mjStatistic.center points at hammer's far wall).
        st = jax.jit(self.env.reset)(self._key)
        gx = np.asarray(st.data.geom_xpos)
        self.lookat = np.median(gx, axis=0)
        self.state = st

        self._step = jax.jit(self.env.step_auto_reset)
        model = _apply_var(self.env.model, st.var)

        def _render(data_geom_xpos, data_geom_xmat, cam):
            return raster.render(model, data_geom_xpos, data_geom_xmat,
                                 cam, height=self.height,
                                 width=self.width)

        self._render = jax.jit(_render)
        self.fig = None
        self._im = None

    # -- camera ----------------------------------------------------------

    def _camera(self):
        return raster.free_camera(self.lookat, self.azimuth,
                                  self.elevation, self.distance,
                                  fovy_deg=45.0, height_px=self.height)

    def handle_key(self, key: str) -> None:
        """MjViewer-style controls; usable directly (tests) or from the
        matplotlib key_press_event."""
        if key == "left":
            self.azimuth -= 10.0
        elif key == "right":
            self.azimuth += 10.0
        elif key == "up":
            self.elevation = min(self.elevation + 10.0, 89.0)
        elif key == "down":
            self.elevation = max(self.elevation - 10.0, -89.0)
        elif key in ("+", "="):
            self.distance = max(0.2, self.distance * 0.8)
        elif key == "-":
            self.distance = min(20.0, self.distance * 1.25)
        elif key == " ":
            self.paused = not self.paused
        elif key == "r":
            self._key, sub = jax.random.split(self._key)
            self.state = jax.jit(self.env.reset)(sub)
        elif key in ("q", "escape"):
            self.closed = True

    # -- stepping --------------------------------------------------------

    def _action(self, t: int) -> jnp.ndarray:
        # Reference visualise_policy warm-up: zero actions for the first
        # `warmup_steps` (`visualize_env.py:85-93`).
        if t < self.warmup_steps or self.policy is None:
            return jnp.zeros((self.env.nu,), jnp.float32)
        return jnp.asarray(self.policy(np.asarray(self.state.obs)),
                           jnp.float32)

    def frame(self) -> np.ndarray:
        """Render the current state with the current camera -> (H, W, 3)
        uint8."""
        img = self._render(self.state.data.geom_xpos,
                           self.state.data.geom_xmat, self._camera())
        return np.asarray(jnp.round(img)).astype(np.uint8)

    def run(self, episodes: int = 2, max_steps: Optional[int] = None,
            fps: float = 25.0) -> float:
        """Roll `episodes` episodes; returns the last episode's score.
        With a windowless backend (Agg) this never blocks."""
        plt = self._plt
        interactive = plt.get_backend().lower() not in ("agg",)
        if interactive and self.fig is None:
            self.fig, ax = plt.subplots(
                figsize=(self.width / 80, self.height / 80))
            ax.set_axis_off()
            self._im = ax.imshow(self.frame())
            self.fig.canvas.mpl_connect(
                "key_press_event", lambda ev: self.handle_key(ev.key))
            plt.show(block=False)

        score = 0.0
        cap = max_steps or self.env.MAX_EPISODE_STEPS
        for ep in range(episodes):
            score, t = 0.0, 0
            while t < cap and not self.closed:
                if not self.paused:
                    self.state = self._step(self.state, self._action(t))
                    score += float(self.state.reward)
                    t += 1
                if interactive:
                    self._im.set_data(self.frame())
                    self.fig.canvas.draw_idle()
                    plt.pause(max(1e-3, 1.0 / fps))
            print(f"Episode score = {score}", flush=True)
            if self.closed:
                break
            self.handle_key("r")
        if interactive and self.fig is not None:
            plt.close(self.fig)
        return score


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--env_name", required=True)
    ap.add_argument("--policy", default=None,
                    help="checkpoint (.msgpack) or DAPG pickle; zero "
                         "actions if omitted")
    ap.add_argument("--episodes", type=int, default=2)
    ap.add_argument("--max_steps", type=int, default=None)
    ap.add_argument("--backend", default=None,
                    help="matplotlib backend override (e.g. Agg)")
    args = ap.parse_args(argv)

    policy = None
    if args.policy:
        from .visualize import _load_policy
        env = envs.make(args.env_name)
        policy, kind = _load_policy(args.policy, env, env.TASK)
        print(f"loaded {kind} policy from {args.policy}", flush=True)
    v = InteractiveViewer(args.env_name, policy=policy,
                          backend=args.backend)
    v.run(episodes=args.episodes, max_steps=args.max_steps)


if __name__ == "__main__":
    main()
