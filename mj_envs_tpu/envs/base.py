"""Functional task-environment base for the Adroit suite.

TPU-first design (not a port of the reference's gym classes):

* Everything is pure: ``env.reset(key) -> EnvState`` and
  ``env.step(state, action) -> EnvState`` are jittable and vmappable, so a
  batched rollout is ``jax.vmap(env.step)`` under one jit, with the whole
  physics pipeline + obs + reward + termination fused into a single XLA
  program (the reference's hot loop, `helpers.step` ->
  `CustomPixelObservationWrapper.step` -> `HammerEnvV0.step` ->
  `do_simulation` -> C mj_step, collapses into this one function).

* Per-env *model* randomization (the reference mutates the compiled model
  at reset: nail-board height `hammer_v0.py:106-129`, door frame pos
  `door_v0.py:103-110`, pen target quat `pen_v0.py:115-123`, relocate
  object/target pos `relocate_v0.py:85-94`) is carried as a small
  ``ModelVar`` pytree inside ``EnvState`` and substituted into the shared
  ``Model`` at the top of ``step``.  The base ``Model`` itself is never
  batched, so vmap broadcasts it for free.

* The reference's constructor-time actuator overwrite (identical 4 lines in
  every env, e.g. `hammer_v0.py:29-32`: wrist gain [10,0,0]/bias [0,-10,0],
  finger gain [1,0,0]/bias [0,-1,0]) is applied once at build time here.

* Actions are in [-1, 1]^nu, de-normalized with the ctrlrange midpoint /
  half-range exactly like `hammer_v0.py:49-59`.
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from flax import struct

from ..mjcf import builder as B, task_xml_path
from ..physics import pipeline
from ..physics.model import Model, Data, make_data


@struct.dataclass
class ModelVar:
    """Per-env randomized model fields — a strict, TASK-DEPENDENT subset
    of Model leaves.  Only fields the task actually randomizes are
    carried; the rest stay None (an unused field would become a batched
    Model leaf under vmap and push every consumer — narrowphase sizes,
    CRB masses, FK offsets — onto its per-env-batched path: measured
    ~13% of the whole hammer substep at 4096 envs for fields that never
    varied)."""

    body_pos: Optional[jnp.ndarray] = None     # (nbody, 3)
    body_quat: Optional[jnp.ndarray] = None    # (nbody, 4)
    body_mass: Optional[jnp.ndarray] = None    # (nbody,)
    site_pos: Optional[jnp.ndarray] = None     # (nsite, 3)
    geom_pos: Optional[jnp.ndarray] = None     # (ngeom, 3)
    geom_size: Optional[jnp.ndarray] = None    # (ngeom, 3)
    geom_rgba: Optional[jnp.ndarray] = None    # (ngeom, 4)

    FIELDS = ("body_pos", "body_quat", "body_mass", "site_pos",
              "geom_pos", "geom_size", "geom_rgba")


@struct.dataclass
class EnvState:
    """Complete per-env state: physics Data + model variation + task
    bookkeeping.  `obs`/`reward`/`done` mirror the reference step outputs;
    `info` holds `goal_achieved` (reference `dict(goal_achieved=...)`)."""

    data: Data
    var: ModelVar
    obs: jnp.ndarray
    reward: jnp.ndarray       # ()
    done: jnp.ndarray         # () bool — episode boundary under
                              # step_auto_reset (termination OR
                              # truncation OR quarantine); task
                              # termination only under plain step
    goal_achieved: jnp.ndarray  # () bool
    step_count: jnp.ndarray   # () int32
    key: jax.Array            # PRNG key for this env's future resets
    nan_resets: jnp.ndarray   # () int32 — quarantined non-finite states
    truncated: jnp.ndarray    # () bool — boundary was the episode cap,
                              # not task termination: learners should
                              # bootstrap V(final_obs) there (the
                              # reference's SB3 PPO bootstraps
                              # terminal_observation at TimeLimit)
    final_obs: jnp.ndarray    # the finishing step's obs — under auto-
                              # reset `obs` is already the NEXT
                              # episode's first obs at a boundary
    contact_clips: jnp.ndarray  # () int32 — env steps in which any
                              # substep's narrowphase found more contacts
                              # than the ncmax active slots (compact()
                              # dropped the overflow) — a nonzero value
                              # flags potential divergence from the
                              # oracle under extreme variations


def _apply_var(model: Model, var: ModelVar) -> Model:
    """Substitute the carried (non-None) randomized fields into the
    shared Model.  Nones are static pytree structure, so this stays
    jit/vmap-transparent."""
    repl = {f: getattr(var, f) for f in ModelVar.FIELDS
            if getattr(var, f) is not None}
    return model.replace(**repl) if repl else model


class AdroitEnv:
    """Base class; subclasses implement `_obs`, `_reward_done`,
    `_reset_var`.  Static/python attributes only — instances are hashable
    by identity and close over the jitted functions."""

    TASK: str = ""
    FRAME_SKIP: int = 5
    MAX_EPISODE_STEPS: int = 200
    OBS_DIM: int = 0

    def __init__(self, variation_type: Optional[str] = None,
                 dtype=jnp.float32, xml_path: Optional[str] = None):
        self.variation_type = variation_type
        self.dtype = dtype
        path = xml_path or task_xml_path(self.TASK)
        model = B.build_from_xml(path, dtype=np.dtype(dtype))
        self.model = self._override_actuators(model)
        s = model.spec
        self.spec = s
        self.nu = s.nu
        self.nq = s.nq
        self.nv = s.nv
        self.ncmax = pipeline._ncmax(s)

        cr = np.asarray(self.model.act_ctrlrange)
        self.act_mid = jnp.asarray(cr.mean(axis=1), dtype=dtype)
        self.act_rng = jnp.asarray(0.5 * (cr[:, 1] - cr[:, 0]), dtype=dtype)
        self._resolve_ids()

    # -- construction helpers -------------------------------------------------

    def _override_actuators(self, model: Model) -> Model:
        """Reference ctor actuator sensitivity overwrite
        (`hammer_v0.py:29-32` and identical lines in the other three)."""
        s = model.spec
        a = s.names["actuator"]
        gain = np.asarray(model.act_gainprm).copy()
        bias = np.asarray(model.act_biasprm).copy()
        w0, w1 = a["A_WRJ1"], a["A_WRJ0"]
        f0, f1 = a["A_FFJ3"], a["A_THJ0"]
        gain[w0:w1 + 1, :3] = [10, 0, 0]
        bias[w0:w1 + 1, :3] = [0, -10, 0]
        gain[f0:f1 + 1, :3] = [1, 0, 0]
        bias[f0:f1 + 1, :3] = [0, -1, 0]
        return model.replace(act_gainprm=jnp.asarray(gain, dtype=gain.dtype),
                             act_biasprm=jnp.asarray(bias, dtype=bias.dtype))

    def _resolve_ids(self):
        """Subclasses resolve name->id constants here."""
        raise NotImplementedError

    # Which Model fields this task randomizes at reset (subclasses
    # override; hammer extends per variation_type).
    VAR_FIELDS: Tuple[str, ...] = ("body_pos",)

    def var_fields(self) -> Tuple[str, ...]:
        return self.VAR_FIELDS

    def base_var(self) -> ModelVar:
        m = self.model
        return ModelVar(**{f: getattr(m, f) for f in self.var_fields()})

    # -- task hooks -----------------------------------------------------------

    def _reset_var(self, var: ModelVar, key: jax.Array) -> ModelVar:
        """Task reset-time model randomization (pure)."""
        raise NotImplementedError

    def _obs(self, model: Model, d: Data) -> jnp.ndarray:
        raise NotImplementedError

    def _reward_done(self, model: Model, d: Data) -> Tuple[
            jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        """-> (reward, done, goal_achieved)."""
        raise NotImplementedError

    # -- core API -------------------------------------------------------------

    def reset(self, key: jax.Array) -> EnvState:
        """Fresh episode: qpos0/qvel0, task randomization, forward pass.
        Mirrors `reset_model` semantics (`hammer_v0.py:106-132`)."""
        key, sub = jax.random.split(key)
        var = self._reset_var(self.base_var(), sub)
        model = _apply_var(self.model, var)
        d = make_data(model, dtype=self.dtype)
        # Light forward (no collision/solve): step_auto_reset pays reset
        # every vectorized step, and the first obs needs only kinematic
        # caches + jointpos/actuatorfrc sensors (see forward_light).
        d = pipeline.forward_light(model, d)
        obs = self._obs(model, d)
        zero = jnp.zeros((), dtype=self.dtype)
        return EnvState(
            data=d, var=var, obs=obs, reward=zero,
            done=jnp.zeros((), dtype=bool),
            goal_achieved=jnp.zeros((), dtype=bool),
            step_count=jnp.zeros((), dtype=jnp.int32), key=key,
            nan_resets=jnp.zeros((), dtype=jnp.int32),
            truncated=jnp.zeros((), dtype=bool), final_obs=obs,
            contact_clips=jnp.zeros((), dtype=jnp.int32))

    def step(self, state: EnvState, action: jnp.ndarray) -> EnvState:
        """One env step = clip/de-normalize + FRAME_SKIP physics substeps +
        obs/reward/termination (`hammer_v0.py:54-90`)."""
        model = _apply_var(self.model, state.var)
        a = jnp.clip(action, -1.0, 1.0).astype(self.dtype)
        ctrl = self.act_mid + a * self.act_rng

        def substep(d, _):
            d = pipeline.step(model, d, ctrl)
            return d, d.ncon_active

        d, ncon_seq = jax.lax.scan(substep, state.data, (),
                                   length=self.FRAME_SKIP)
        clipped = jnp.any(ncon_seq > self.ncmax)
        obs = self._obs(model, d)
        reward, done, goal = self._reward_done(model, d)
        return state.replace(
            data=d, obs=obs, reward=reward.astype(self.dtype), done=done,
            goal_achieved=goal, step_count=state.step_count + 1,
            truncated=jnp.zeros((), dtype=bool), final_obs=obs,
            contact_clips=state.contact_clips + clipped.astype(jnp.int32))

    def step_auto_reset(self, state: EnvState,
                        action: jnp.ndarray) -> EnvState:
        """step + in-graph auto-reset on termination OR episode cap.

        On restart the returned state is the freshly reset episode,
        *including its first observation* (the brax/gymnax auto-reset
        convention: the next policy action must be computed from the new
        episode's obs, not the finished one's terminal obs).  The
        finishing step's reward/done/goal_achieved are kept so learners
        see the true terminal transition.  Truncation at
        MAX_EPISODE_STEPS mirrors the gym registration caps
        (`mj_envs_vision/__init__.py:4-28`).

        Fault handling (no reference counterpart — SURVEY §5 failure
        detection): a non-finite post-step state (solver blow-up) is
        quarantined in-graph: the env restarts fresh, the poisoned
        reward is zeroed, done is reported so the learner cuts the GAE
        bootstrap, and `nan_resets` counts the event for metrics.  One
        bad env can therefore never poison a training batch."""
        return self._step_auto_reset_pair(state, action)[0]

    def _step_auto_reset_pair(self, state: EnvState,
                              action: jnp.ndarray
                              ) -> Tuple[EnvState, EnvState]:
        """step_auto_reset that ALSO returns the raw post-step (pre-merge)
        state — pixel learners need it to render the finishing frame at a
        truncation boundary (`algos/ppo.make_pixel_ppo`); the merged
        state's Data is already the next episode's there."""
        st = self.step(state, action)
        finite = (jnp.all(jnp.isfinite(st.data.qpos))
                  & jnp.all(jnp.isfinite(st.data.qvel))
                  & jnp.all(jnp.isfinite(st.obs))
                  & jnp.all(jnp.isfinite(st.reward)))
        trunc = st.step_count >= self.MAX_EPISODE_STEPS
        restart = st.done | trunc | ~finite
        fresh = self.reset(st.key)

        new_core = jax.tree_util.tree_map(
            lambda a, b: jnp.where(restart, a, b), fresh, st)
        # Keep the finishing step's outward-facing reward/termination
        # fields; obs intentionally comes from new_core (fresh on
        # restart, post-step otherwise).  done reports EVERY episode
        # boundary (termination, truncation, quarantine) — the brax
        # AutoResetWrapper convention: since the returned obs is already
        # the next episode's, a learner that bootstraps with
        # (1 - done) * V(next_obs) would otherwise leak the fresh
        # episode's value across the boundary (GAE deltas, SAC targets).
        # Pure truncation (cap hit, no task termination, state sound):
        # the episode did NOT end by the task's rules, so a learner
        # should bootstrap V(final_obs) there instead of zero — the
        # reference's SB3 PPO does exactly this with gym's TimeLimit
        # terminal_observation.  Quarantine is treated as termination
        # (final_obs would be poisoned).
        merged = new_core.replace(
            reward=jnp.where(finite, st.reward,
                             jnp.zeros_like(st.reward)),
            done=restart,
            truncated=trunc & ~st.done & finite,
            final_obs=st.obs,
            goal_achieved=st.goal_achieved & finite,
            nan_resets=state.nan_resets + (~finite).astype(jnp.int32),
            contact_clips=st.contact_clips)
        return merged, st

    # -- parity/debug API (get_env_state/set_env_state analogue) --------------

    def get_env_state(self, state: EnvState) -> Dict[str, Any]:
        return dict(qpos=np.asarray(state.data.qpos),
                    qvel=np.asarray(state.data.qvel))

    def set_physics_state(self, state: EnvState, qpos, qvel) -> EnvState:
        """set_state + forward (reference `set_env_state`)."""
        model = _apply_var(self.model, state.var)
        d = state.data.replace(qpos=jnp.asarray(qpos, dtype=self.dtype),
                               qvel=jnp.asarray(qvel, dtype=self.dtype))
        d = pipeline.forward(model, d)
        return state.replace(data=d, obs=self._obs(model, d))

    # -- success metric (reference `evaluate_success`) -------------------------

    SUCCESS_STEPS: int = 25

    def evaluate_success(self, goal_achieved_paths: np.ndarray) -> float:
        """% of paths whose per-step goal_achieved sums exceed the task
        threshold (`hammer_v0.py:167-175`, `pen_v0.py:180-188`).
        `goal_achieved_paths`: (paths, T) bool."""
        per_path = np.asarray(goal_achieved_paths).sum(axis=-1)
        return 100.0 * float((per_path > self.SUCCESS_STEPS).sum()) \
            / per_path.shape[0]
