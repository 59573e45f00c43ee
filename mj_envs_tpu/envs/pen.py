"""pen-v0: in-hand pen reorientation to a randomized target orientation.

Reference: `mj_envs_vision/hand_manipulation_suite/pen_v0.py` — obs
`:104-113`, reward + drop termination `:66-102` (the only terminating
task), reset `:115-123` (target body_quat from random xy Euler angles),
success threshold 20 steps `:180-188`.  `pen_length`/`tar_length` are
frozen at construction (`:57-58`) — site offset norms, orientation
independent.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from .base import AdroitEnv, ModelVar
from ..physics.model import Model, Data
from ..utils import quatmath as Q


class PenEnv(AdroitEnv):
    TASK = "pen"
    FRAME_SKIP = 5
    MAX_EPISODE_STEPS = 100
    OBS_DIM = 45
    VAR_FIELDS = ("body_quat",)
    SUCCESS_STEPS = 20

    def _resolve_ids(self):
        s = self.spec
        self.target_obj_bid = s.name2id("body", "target")
        self.S_grasp_sid = s.name2id("site", "S_grasp")
        self.obj_bid = s.name2id("body", "Object")
        self.eps_ball_sid = s.name2id("site", "eps_ball")
        self.obj_t_sid = s.name2id("site", "object_top")
        self.obj_b_sid = s.name2id("site", "object_bottom")
        self.tar_t_sid = s.name2id("site", "target_top")
        self.tar_b_sid = s.name2id("site", "target_bottom")
        # Frozen lengths (reference :57-58): top/bottom sites share a body,
        # so the norm equals the site-offset distance at any orientation.
        sp = np.asarray(self.model.site_pos)
        self.pen_length = float(np.linalg.norm(
            sp[self.obj_t_sid] - sp[self.obj_b_sid]))
        self.tar_length = float(np.linalg.norm(
            sp[self.tar_t_sid] - sp[self.tar_b_sid]))

    def _reset_var(self, var: ModelVar, key: jax.Array) -> ModelVar:
        kx, ky = jax.random.split(key)
        euler = jnp.stack([
            jax.random.uniform(kx, (), self.dtype, -1.0, 1.0),
            jax.random.uniform(ky, (), self.dtype, -1.0, 1.0),
            jnp.zeros((), self.dtype)])
        quat = Q.euler2quat(euler).astype(self.dtype)
        return var.replace(
            body_quat=var.body_quat.at[self.target_obj_bid].set(quat))

    def _orientations(self, d: Data):
        obj_orien = (d.site_xpos[self.obj_t_sid]
                     - d.site_xpos[self.obj_b_sid]) / self.pen_length
        desired_orien = (d.site_xpos[self.tar_t_sid]
                         - d.site_xpos[self.tar_b_sid]) / self.tar_length
        return obj_orien, desired_orien

    def _obs(self, model: Model, d: Data) -> jnp.ndarray:
        qp = d.qpos
        obj_vel = d.qvel[-6:]
        obj_pos = d.xpos[self.obj_bid]
        desired_pos = d.site_xpos[self.eps_ball_sid]
        obj_orien, desired_orien = self._orientations(d)
        return jnp.concatenate([
            qp[:-6], obj_pos, obj_vel, obj_orien, desired_orien,
            obj_pos - desired_pos, obj_orien - desired_orien])

    def _reward_done(self, model: Model, d: Data):
        obj_pos = d.xpos[self.obj_bid]
        desired_loc = d.site_xpos[self.eps_ball_sid]
        obj_orien, desired_orien = self._orientations(d)

        dist = jnp.linalg.norm(obj_pos - desired_loc)
        orien_similarity = jnp.dot(obj_orien, desired_orien)
        reward = -dist + orien_similarity
        close = dist < 0.075
        reward = reward + jnp.where(close & (orien_similarity > 0.90),
                                    10.0, 0.0)
        reward = reward + jnp.where(close & (orien_similarity > 0.95),
                                    50.0, 0.0)
        dropped = obj_pos[2] < 0.075
        reward = reward + jnp.where(dropped, -5.0, 0.0)
        goal_achieved = close & (orien_similarity > 0.95)
        return reward, dropped, goal_achieved
