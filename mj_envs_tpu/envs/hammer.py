"""hammer-v0: drive the nail into the board with the hammer.

Obs/reward/reset semantics follow the reference
`mj_envs_vision/hand_manipulation_suite/hammer_v0.py` exactly:
obs `:92-104`, reward `:62-88`, reset randomization `:106-129`
(board height + optional mass/pos/size variations), success `:167-175`.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .base import AdroitEnv, ModelVar
from ..physics.model import Model, Data
from ..utils import quatmath as Q


class HammerEnv(AdroitEnv):
    TASK = "hammer"
    FRAME_SKIP = 5
    MAX_EPISODE_STEPS = 200
    OBS_DIM = 46
    SUCCESS_STEPS = 25

    def var_fields(self):
        """Board height always (body_pos); variations add their fields
        (`hammer_v0.py:106-129`)."""
        extra = {"mass": ("body_mass", "geom_rgba"),
                 "pos": ("geom_pos",),
                 "size": ("geom_size",)}.get(self.variation_type, ())
        return ("body_pos",) + extra

    def _resolve_ids(self):
        s = self.spec
        self.target_obj_sid = s.name2id("site", "S_target")
        self.S_grasp_sid = s.name2id("site", "S_grasp")
        self.obj_bid = s.name2id("body", "Object")
        self.tool_sid = s.name2id("site", "tool")
        self.goal_sid = s.name2id("site", "nail_goal")
        self.board_bid = s.name2id("body", "nail_board")
        self.head_gid = s.name2id("geom", "head")
        self.neck_gid = s.name2id("geom", "neck")
        nail_sensor = s.names["sensor"]["S_nail"]
        self.nail_adr = s.sensors[nail_sensor][2]

    def _reset_var(self, var: ModelVar, key: jax.Array) -> ModelVar:
        kb, km, kp, ks1, ks2 = jax.random.split(key, 5)
        z = jax.random.uniform(kb, (), self.dtype, 0.1, 0.25)
        var = var.replace(
            body_pos=var.body_pos.at[self.board_bid, 2].set(z))
        if self.variation_type == "mass":
            x = jax.random.uniform(km, (), self.dtype, 0.05, 2.5)
            var = var.replace(
                body_mass=var.body_mass.at[self.obj_bid].set(x),
                geom_rgba=var.geom_rgba.at[self.head_gid, 0].set(x / 2.5))
        elif self.variation_type == "pos":
            x = jax.random.uniform(kp, (), self.dtype, -0.24, -0.10)
            var = var.replace(geom_pos=var.geom_pos
                              .at[self.head_gid, 0].set(x)
                              .at[self.neck_gid, 0].set(-0.14 - (-0.24 - x)))
        elif self.variation_type == "size":
            r = jax.random.uniform(ks1, (), self.dtype, 0.01, 0.04)
            hl = jax.random.uniform(ks2, (), self.dtype, 0.02, 0.08)
            var = var.replace(geom_size=var.geom_size
                              .at[self.head_gid, 0].set(r)
                              .at[self.head_gid, 1].set(hl))
        elif self.variation_type is not None:
            raise ValueError(
                f"Unsupported variation type {self.variation_type}")
        return var

    def _obs(self, model: Model, d: Data) -> jnp.ndarray:
        qp = d.qpos
        qv = jnp.clip(d.qvel, -1.0, 1.0)
        obj_pos = d.xpos[self.obj_bid]
        obj_rot = Q.quat2euler(d.xquat[self.obj_bid])
        palm_pos = d.site_xpos[self.S_grasp_sid]
        target_pos = d.site_xpos[self.target_obj_sid]
        nail_impact = jnp.clip(d.sensordata[self.nail_adr], -1.0, 1.0)
        return jnp.concatenate([
            qp[:-6], qv[-6:], palm_pos, obj_pos, obj_rot, target_pos,
            nail_impact[None]])

    def _reward_done(self, model: Model, d: Data):
        obj_pos = d.xpos[self.obj_bid]
        palm_pos = d.site_xpos[self.S_grasp_sid]
        tool_pos = d.site_xpos[self.tool_sid]
        target_pos = d.site_xpos[self.target_obj_sid]
        goal_pos = d.site_xpos[self.goal_sid]

        tg = jnp.linalg.norm(target_pos - goal_pos)
        reward = (-0.1 * jnp.linalg.norm(palm_pos - obj_pos)
                  - jnp.linalg.norm(tool_pos - target_pos)
                  - 10.0 * tg
                  - 1e-2 * jnp.linalg.norm(d.qvel))
        lifted = (obj_pos[2] > 0.04) & (tool_pos[2] > 0.04)
        reward = reward + jnp.where(lifted, 2.0, 0.0)
        reward = reward + jnp.where(tg < 0.020, 25.0, 0.0)
        reward = reward + jnp.where(tg < 0.010, 75.0, 0.0)
        goal_achieved = tg < 0.010
        done = jnp.zeros((), dtype=bool)   # hammer never terminates (:90)
        return reward, done, goal_achieved
