"""Tendon kinematics and actuator forces.

The suite uses only *fixed* tendons (pure linear couplings over qpos,
`DAPG_assets.xml:95-240`) and *general* actuators with joint transmission,
fixed gain and affine bias (`DAPG_assets.xml:242-267`, task-arm actuators in
each task XML).  The reference envs rewrite gain/bias at runtime
(`hammer_v0.py:29-32`), which here is just a Model leaf update.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from .model import Model


class Actuation(NamedTuple):
    ten_length: jnp.ndarray       # (nten,)
    ten_velocity: jnp.ndarray     # (nten,)
    actuator_length: jnp.ndarray  # (nu,)
    actuator_velocity: jnp.ndarray  # (nu,)
    actuator_force: jnp.ndarray   # (nu,) scalar transmission force
    qfrc_actuator: jnp.ndarray    # (nv,)


def tendon(m: Model, qpos: jnp.ndarray, qvel: jnp.ndarray):
    """Fixed-tendon length/velocity.  Moment matrix == ten_coef."""
    ten_length = m.ten_coef @ qpos
    ten_velocity = m.ten_coef @ qvel
    return ten_length, ten_velocity


def actuation(m: Model, qpos: jnp.ndarray, qvel: jnp.ndarray,
              ctrl: jnp.ndarray) -> Actuation:
    s = m.spec
    ten_length, ten_velocity = tendon(m, qpos, qvel)

    # Joint transmission, gear = 1 (no gear attributes in the suite).
    length = qpos[s.act_trnid]
    velocity = qvel[s.act_trnid]

    # Clamp ctrl to ctrlrange (all actuators are ctrllimited here).
    lo, hi = m.act_ctrlrange[:, 0], m.act_ctrlrange[:, 1]
    c = jnp.clip(ctrl, lo, hi)

    gain = m.act_gainprm[:, 0]  # gaintype == fixed
    affine = jnp.asarray(s.act_biastype == 1)
    bias = jnp.where(
        affine,
        m.act_biasprm[:, 0] + m.act_biasprm[:, 1] * length
        + m.act_biasprm[:, 2] * velocity,
        0.0,
    )
    force = gain * c + bias
    force = jnp.where(
        m.act_forcelimited,
        jnp.clip(force, m.act_forcerange[:, 0], m.act_forcerange[:, 1]),
        force,
    )

    qfrc = jnp.zeros_like(qpos).at[s.act_trnid].add(force)
    return Actuation(
        ten_length=ten_length, ten_velocity=ten_velocity,
        actuator_length=length, actuator_velocity=velocity,
        actuator_force=force, qfrc_actuator=qfrc,
    )
