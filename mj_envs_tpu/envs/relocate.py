"""relocate-v0: pick up the ball and move it to a floating target.

Reference: `mj_envs_vision/hand_manipulation_suite/relocate_v0.py` — obs
`:74-83`, staged reward `:54-72`, reset `:85-94` (object xy + target xyz
randomization), success `:131-139`.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .base import AdroitEnv, ModelVar
from ..physics.model import Model, Data


class RelocateEnv(AdroitEnv):
    TASK = "relocate"
    FRAME_SKIP = 5
    MAX_EPISODE_STEPS = 200
    OBS_DIM = 39
    VAR_FIELDS = ("body_pos", "site_pos")
    SUCCESS_STEPS = 25

    def _resolve_ids(self):
        s = self.spec
        self.target_obj_sid = s.name2id("site", "target")
        self.S_grasp_sid = s.name2id("site", "S_grasp")
        self.obj_bid = s.name2id("body", "Object")

    def _reset_var(self, var: ModelVar, key: jax.Array) -> ModelVar:
        kox, koy, ktx, kty, ktz = jax.random.split(key, 5)
        ox = jax.random.uniform(kox, (), self.dtype, -0.15, 0.15)
        oy = jax.random.uniform(koy, (), self.dtype, -0.15, 0.3)
        tx = jax.random.uniform(ktx, (), self.dtype, -0.2, 0.2)
        ty = jax.random.uniform(kty, (), self.dtype, -0.2, 0.2)
        tz = jax.random.uniform(ktz, (), self.dtype, 0.15, 0.35)
        return var.replace(
            body_pos=var.body_pos
            .at[self.obj_bid, 0].set(ox).at[self.obj_bid, 1].set(oy),
            site_pos=var.site_pos
            .at[self.target_obj_sid, 0].set(tx)
            .at[self.target_obj_sid, 1].set(ty)
            .at[self.target_obj_sid, 2].set(tz))

    def _obs(self, model: Model, d: Data) -> jnp.ndarray:
        qp = d.qpos
        obj_pos = d.xpos[self.obj_bid]
        palm_pos = d.site_xpos[self.S_grasp_sid]
        target_pos = d.site_xpos[self.target_obj_sid]
        return jnp.concatenate([
            qp[:-6], palm_pos - obj_pos, palm_pos - target_pos,
            obj_pos - target_pos])

    def _reward_done(self, model: Model, d: Data):
        obj_pos = d.xpos[self.obj_bid]
        palm_pos = d.site_xpos[self.S_grasp_sid]
        target_pos = d.site_xpos[self.target_obj_sid]

        ot = jnp.linalg.norm(obj_pos - target_pos)
        lifted = obj_pos[2] > 0.04
        reward = -0.1 * jnp.linalg.norm(palm_pos - obj_pos)
        reward = reward + jnp.where(
            lifted,
            1.0 - 0.5 * jnp.linalg.norm(palm_pos - target_pos) - 0.5 * ot,
            0.0)
        reward = reward + jnp.where(ot < 0.1, 10.0, 0.0)
        reward = reward + jnp.where(ot < 0.05, 20.0, 0.0)
        goal_achieved = ot < 0.1
        return reward, jnp.zeros((), dtype=bool), goal_achieved
