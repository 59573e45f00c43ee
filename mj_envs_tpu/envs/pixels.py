"""Pixel observations — the "mj_envs_vision" variants.

Reproduces the reference chain (`headless_observer.py` +
`utils/wrappers.py CustomPixelObservationWrapper:32-76`): a free camera
with azimuth=90, distance=4.5 and an elevation computed from the lookat
vector between a task body and the LAST model camera (`set_view
'default'`, `:59-67`), rendered offscreen, center-cropped to 128x128 and
resized to 64x64.  The wrapper keeps BOTH the state vector and pixels
(`get_pixels/get_state`, wrappers.py:72-76).

Reference quirks preserved (they are deterministic and observable):
* hammer constructs its observer before name resolution, so its lookat
  body is index -1 (the last body); door/pen/relocate pass their
  pre-resolution id 0 (world) (`hammer_v0.py:34-42` vs `door_v0.py:41`,
  `relocate_v0.py:31-38`, SURVEY.md §2.7d note).
* the lookat target of the free camera is mujoco-py's
  MjRenderContext._init_camera median-of-geom-positions (see ctor);
  elevation = -45 + deg(arccos(lookat_x / lookat_z)) / 2.
"""
from __future__ import annotations

from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp
from flax import struct

from .base import AdroitEnv, EnvState, _apply_var
from ..render import raster


@struct.dataclass
class PixelEnvState:
    state: EnvState
    pixels: jnp.ndarray       # (64, 64, 3) float32 [0, 255]


class PixelObservationEnv:
    """Functional pixel-obs wrapper over an AdroitEnv."""

    def __init__(self, env: AdroitEnv, height: int = 64, width: int = 64):
        self.env = env
        self.height = height
        self.width = width
        s = env.spec
        # Free-camera lookat: mujoco-py's MjRenderContext._init_camera
        # sets `cam.lookat[i] = median(sim.data.geom_xpos[:, i])` — the
        # per-axis MEDIAN of geom positions when the offscreen context is
        # created (NOT mjStatistic.center: hammer's 10x10 occluder wall
        # at y=5 drags the bbox-midpoint to y=5, which would point the
        # camera at the wall; the median rejects it).  The reference's
        # HeadlessObserver then only changes az/el/dist
        # (`headless_observer.py:26-31`), so the median lookat persists.
        import mj_envs_tpu.physics.kinematics as K
        # jit: run eagerly the unrolled kinematics is hundreds of tiny
        # dispatches — minutes through the axon TPU tunnel.
        kin = jax.jit(K.kinematics)(env.model, env.model.qpos0)
        gx = np.asarray(kin.geom_xpos)
        self.stat_center = np.median(gx, axis=0)

        # Reference lookat body for the elevation formula.
        self.lookat_bid = (s.nbody - 1 if env.TASK == "hammer" else 0)
        # Last model camera (vil_camera) position is the reference's
        # cam_xpos[-1] at setup time.
        self.cam_pos_last = np.asarray(kin.geom_xpos)[0] * 0  # fallback 0
        if s.ncam > 0:
            import mj_envs_tpu.utils.quatmath as Q
            cb = int(s.cam_bodyid[s.ncam - 1])
            xb = np.asarray(kin.xpos)[cb]
            qb = np.asarray(kin.xquat)[cb]
            off = np.asarray(env.model.cam_pos)[s.ncam - 1]
            rot = np.asarray(Q.quat2mat(jnp.asarray(qb)))
            self.cam_pos_last = xb + rot @ off

        body_x = np.asarray(kin.xpos)[self.lookat_bid]
        lookatv = body_x - self.cam_pos_last
        ratio = np.clip(lookatv[0] / lookatv[2] if lookatv[2] != 0 else 0.0,
                        -1.0, 1.0)
        self.elevation = -45.0 + np.degrees(np.arccos(ratio)) / 2.0
        self.azimuth = 90.0
        self.distance = 4.5

        self.camera = raster.free_camera(
            self.stat_center, self.azimuth, self.elevation, self.distance,
            fovy_deg=45.0, height_px=480)

    def _render(self, state: EnvState) -> jnp.ndarray:
        model = _apply_var(self.env.model, state.var)
        img128 = raster.render(model, state.data.geom_xpos,
                               state.data.geom_xmat, self.camera,
                               height=128, width=128)
        if self.height == 64:
            return raster.resize_half(img128)
        return img128

    def reset(self, key: jax.Array) -> PixelEnvState:
        st = self.env.reset(key)
        return PixelEnvState(state=st, pixels=self._render(st))

    def step(self, pstate: PixelEnvState, action) -> PixelEnvState:
        st = self.env.step_auto_reset(pstate.state, action)
        return PixelEnvState(state=st, pixels=self._render(st))

    # reference wrapper accessors (wrappers.py:72-76)
    def get_pixels(self, pstate: PixelEnvState) -> jnp.ndarray:
        return pstate.pixels

    def get_state(self, pstate: PixelEnvState) -> jnp.ndarray:
        return pstate.state.obs
