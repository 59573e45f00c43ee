"""door-v0: undo the latch and swing the door open.

Reference: `mj_envs_vision/hand_manipulation_suite/door_v0.py` — obs
`:87-101`, reward `:62-85`, reset `:103-118` (frame position
randomization), frame_skip **1** (`:10,22` — this snapshot's deliberate
divergence from upstream's 5), success `:147-155`.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .base import AdroitEnv, ModelVar
from ..physics.model import Model, Data


class DoorEnv(AdroitEnv):
    TASK = "door"
    FRAME_SKIP = 1
    MAX_EPISODE_STEPS = 200
    OBS_DIM = 39
    SUCCESS_STEPS = 25

    def _resolve_ids(self):
        s = self.spec
        # door_hinge_did = jnt_dofadr == qpos address (all 1-dof joints).
        self.door_hinge_did = s.name2id("joint", "door_hinge")
        self.grasp_sid = s.name2id("site", "S_grasp")
        self.handle_sid = s.name2id("site", "S_handle")
        self.door_bid = s.name2id("body", "frame")

    def _reset_var(self, var: ModelVar, key: jax.Array) -> ModelVar:
        kx, ky, kz = jax.random.split(key, 3)
        x = jax.random.uniform(kx, (), self.dtype, -0.3, -0.2)
        y = jax.random.uniform(ky, (), self.dtype, 0.25, 0.35)
        z = jax.random.uniform(kz, (), self.dtype, 0.252, 0.35)
        return var.replace(body_pos=var.body_pos
                           .at[self.door_bid, 0].set(x)
                           .at[self.door_bid, 1].set(y)
                           .at[self.door_bid, 2].set(z))

    def _obs(self, model: Model, d: Data) -> jnp.ndarray:
        qp = d.qpos
        handle_pos = d.site_xpos[self.handle_sid]
        palm_pos = d.site_xpos[self.grasp_sid]
        door_pos = qp[self.door_hinge_did]
        door_open = jnp.where(door_pos > 1.0, 1.0, -1.0).astype(self.dtype)
        latch_pos = qp[-1]
        return jnp.concatenate([
            qp[1:-2], latch_pos[None], door_pos[None], palm_pos,
            handle_pos, palm_pos - handle_pos, door_open[None]])

    def _reward_done(self, model: Model, d: Data):
        handle_pos = d.site_xpos[self.handle_sid]
        palm_pos = d.site_xpos[self.grasp_sid]
        door_pos = d.qpos[self.door_hinge_did]

        reward = (-0.1 * jnp.linalg.norm(palm_pos - handle_pos)
                  - 0.1 * (door_pos - 1.57) * (door_pos - 1.57)
                  - 1e-5 * jnp.sum(d.qvel ** 2))
        reward = reward + jnp.where(door_pos > 0.2, 2.0, 0.0)
        reward = reward + jnp.where(door_pos > 1.0, 8.0, 0.0)
        reward = reward + jnp.where(door_pos > 1.35, 10.0, 0.0)
        goal_achieved = door_pos >= 1.35
        return reward, jnp.zeros((), dtype=bool), goal_achieved
