"""Model / Data pytrees for the TPU-native physics pipeline.

Design (not a port of mujoco's mjModel/mjData layout, but field names follow
the same vocabulary so the differential tests against the mujoco oracle read
naturally):

* ``ModelSpec`` — static structure: sizes, topology, index arrays, constraint
  layout.  Plain Python object (hashed by identity) stored on ``Model`` as a
  non-pytree field, so a jitted ``step(model, data, ctrl)`` specializes on it.

* ``Model`` — numeric parameters as JAX arrays.  Everything the reference
  mutates at runtime (actuator gains, body_pos/quat, geom pos/size/rgba,
  body_mass, site_pos — see reference ``hammer_v0.py:29-32,106-129``,
  ``relocate_v0.py:89-93``, ``pen_v0.py:122``) is an ordinary leaf here, so
  per-env variation = a Model pytree with a leading batch axis on those
  leaves, handled by ``vmap`` with a Model-shaped ``in_axes`` prefix.

* ``Data`` — per-env dynamic state + cached forward products, mirroring the
  semantics of MjData after ``mj_step`` (kinematics are those of the last
  forward pass, i.e. *pre*-integration — the task layer's obs/reward read
  these stale values exactly like the reference does through mujoco-py).

The suite has only hinge/slide joints (no free/ball), hence ``nq == nv`` and
``qpos`` carries no quaternions.
"""
from __future__ import annotations

from typing import Any, Dict, List, Optional, Tuple

import numpy as np
import jax.numpy as jnp
from flax import struct

# Joint types (MuJoCo enum values).
JNT_SLIDE = 2
JNT_HINGE = 3

# Geom types (MuJoCo enum values).
GEOM_PLANE = 0
GEOM_SPHERE = 2
GEOM_CAPSULE = 3
GEOM_ELLIPSOID = 4
GEOM_CYLINDER = 5
GEOM_BOX = 6
GEOM_MESH = 7

# Constraint-row type enum (mirrors MuJoCo's efc ordering for oracle diffs).
EFC_FRICTION_DOF = 0
EFC_LIMIT_JOINT = 1
EFC_LIMIT_TENDON = 2
EFC_CONTACT = 3


class ModelSpec:
    """Static model structure.  Hashed by identity: build once per task."""

    def __init__(self, **kw: Any):
        # Sizes.
        self.nq: int = 0
        self.nv: int = 0
        self.nu: int = 0
        self.nbody: int = 0
        self.njnt: int = 0
        self.ngeom: int = 0
        self.nsite: int = 0
        self.ncam: int = 0
        self.nten: int = 0
        self.nsensor: int = 0
        self.nsensordata: int = 0
        self.npair: int = 0        # candidate collision pairs
        self.ncon_cap: int = 0     # static contact slots
        self.nefc_cap: int = 0     # static constraint rows

        # Topology (numpy int arrays).
        self.body_parentid: np.ndarray = None
        self.body_rootid: np.ndarray = None
        self.body_weldid: np.ndarray = None
        self.body_mocap: np.ndarray = None      # bool
        self.body_treelevels: Tuple[np.ndarray, ...] = ()
        self.jnt_bodyid: np.ndarray = None
        self.jnt_type: np.ndarray = None
        self.jnt_limited: np.ndarray = None     # bool
        self.jnt_qposadr: np.ndarray = None     # == arange (1-dof joints)
        self.geom_bodyid: np.ndarray = None
        self.geom_type: np.ndarray = None
        self.geom_condim: np.ndarray = None
        self.geom_contype: np.ndarray = None
        self.geom_conaffinity: np.ndarray = None
        self.geom_priority: np.ndarray = None
        self.site_bodyid: np.ndarray = None
        self.site_type: np.ndarray = None
        self.cam_bodyid: np.ndarray = None
        self.act_trnid: np.ndarray = None       # joint id per actuator
        self.act_biastype: np.ndarray = None    # 0 none, 1 affine
        self.ten_limited: np.ndarray = None     # bool
        self.dof_hasfrictionloss: np.ndarray = None  # bool

        # Ancestor/CRB mask: mask[i, j] = dof i on the kinematic path of
        # dof j (i <= j in topological dof order).
        self.ancestor_mask: np.ndarray = None
        # subtree_mask[b, d] = 1 iff body d is in the subtree rooted at b.
        self.subtree_mask: np.ndarray = None
        # body_dofmask[b, i] = 1 iff dof i is on the path world -> body b.
        self.body_dofmask: np.ndarray = None
        # dof_strict_pred[j, i] = 1 iff dof i strictly precedes dof j on
        # the kinematic path of dof j (for cdof_dot accumulation).
        self.dof_strict_pred: np.ndarray = None

        # Collision pair table (static candidates).
        self.pair_geom1: np.ndarray = None
        self.pair_geom2: np.ndarray = None
        self.pair_condim: np.ndarray = None
        self.pair_explicit: np.ndarray = None   # bool: from <pair> element

        # Contact slot table: each candidate pair expands to `maxcon` slots.
        self.con_pairid: np.ndarray = None      # (ncon_cap,)
        self.con_geom1: np.ndarray = None
        self.con_geom2: np.ndarray = None
        self.con_condim: np.ndarray = None

        # Constraint row layout (static): for each row, its type and object.
        self.efc_type: np.ndarray = None        # (nefc_cap,)
        self.efc_id: np.ndarray = None          # dof / joint / tendon / slot
        self.efc_conadr: np.ndarray = None      # contact slot per row (-1)
        self.efc_condir: np.ndarray = None      # pyramid facet index (-1)

        # Sensors: tuples (type str, obj id, output address, dim).
        self.sensors: Tuple[Tuple[str, int, int, int], ...] = ()

        # Names.
        self.names: Dict[str, Dict[str, int]] = {}

        # Options (static scalars).
        self.timestep: float = 0.002
        self.gravity: np.ndarray = np.array([0.0, 0.0, -9.81])
        self.iterations: int = 100
        self.noslip_iterations: int = 0
        self.tolerance: float = 1e-8
        self.noslip_tolerance: float = 1e-6
        self.impratio: float = 1.0
        self.model_name: str = ""

        for k, v in kw.items():
            setattr(self, k, v)

    # Identity hashing: jit caches key on the spec instance.
    def __hash__(self) -> int:
        return id(self)

    def __eq__(self, other: Any) -> bool:
        return self is other

    def name2id(self, kind: str, name: str) -> int:
        return self.names[kind][name]


@struct.dataclass
class Model:
    """Numeric model parameters (JAX arrays; optionally env-batched)."""

    spec: ModelSpec = struct.field(pytree_node=False)

    qpos0: jnp.ndarray            # (nq,)

    body_pos: jnp.ndarray         # (nbody, 3)
    body_quat: jnp.ndarray        # (nbody, 4)
    body_ipos: jnp.ndarray        # (nbody, 3)
    body_iquat: jnp.ndarray       # (nbody, 4)
    body_mass: jnp.ndarray        # (nbody,)
    body_inertia: jnp.ndarray     # (nbody, 3)
    body_invweight0: jnp.ndarray  # (nbody, 2) [trans, rot]

    jnt_pos: jnp.ndarray          # (njnt, 3)
    jnt_axis: jnp.ndarray         # (njnt, 3)
    jnt_range: jnp.ndarray        # (njnt, 2)
    jnt_margin: jnp.ndarray       # (njnt,)
    jnt_stiffness: jnp.ndarray    # (njnt,)
    jnt_springref: jnp.ndarray    # (njnt,)
    jnt_solref_lim: jnp.ndarray   # (njnt, 2)
    jnt_solimp_lim: jnp.ndarray   # (njnt, 5)

    dof_damping: jnp.ndarray      # (nv,)
    dof_armature: jnp.ndarray     # (nv,)
    dof_frictionloss: jnp.ndarray  # (nv,)
    dof_solref_fri: jnp.ndarray   # (nv, 2)
    dof_solimp_fri: jnp.ndarray   # (nv, 5)
    dof_invweight0: jnp.ndarray   # (nv,)

    geom_pos: jnp.ndarray         # (ngeom, 3)
    geom_quat: jnp.ndarray        # (ngeom, 4)
    geom_size: jnp.ndarray        # (ngeom, 3)
    geom_rgba: jnp.ndarray        # (ngeom, 4)

    site_pos: jnp.ndarray         # (nsite, 3)
    site_quat: jnp.ndarray        # (nsite, 4)
    site_size: jnp.ndarray        # (nsite, 3)

    cam_pos: jnp.ndarray          # (ncam, 3)
    cam_quat: jnp.ndarray         # (ncam, 4)

    ten_coef: jnp.ndarray         # (nten, nv) fixed-tendon moment matrix
    ten_range: jnp.ndarray        # (nten, 2)
    ten_margin: jnp.ndarray       # (nten,)
    ten_solref_lim: jnp.ndarray   # (nten, 2)
    ten_solimp_lim: jnp.ndarray   # (nten, 5)
    ten_invweight0: jnp.ndarray   # (nten,)

    act_gainprm: jnp.ndarray      # (nu, 10)
    act_biasprm: jnp.ndarray      # (nu, 10)
    act_ctrlrange: jnp.ndarray    # (nu, 2)
    act_forcerange: jnp.ndarray   # (nu, 2)
    act_forcelimited: jnp.ndarray  # (nu,) bool

    # Per candidate-pair contact parameters (pre-combined at build).
    pair_friction: jnp.ndarray    # (npair, 5)
    pair_margin: jnp.ndarray      # (npair,)
    pair_gap: jnp.ndarray         # (npair,)
    pair_solref: jnp.ndarray      # (npair, 2)
    pair_solimp: jnp.ndarray      # (npair, 5)


@struct.dataclass
class Contact:
    """Static-slot contact buffer: slot -> candidate pair is fixed; only
    geometry and the active mask are dynamic."""

    dist: jnp.ndarray     # (ncon_cap,) signed distance (penetration < 0)
    pos: jnp.ndarray      # (ncon_cap, 3) midpoint
    nrm: jnp.ndarray      # (ncon_cap, 3) contact normal (geom1 -> geom2);
                          #  the full [n, t1, t2] frame is built only for
                          #  the <= ncmax compacted slots (CompactContacts)
    active: jnp.ndarray   # (ncon_cap,) bool — dist < includemargin


@struct.dataclass
class Data:
    """Per-env dynamic state + cached forward products."""

    qpos: jnp.ndarray             # (nq,)
    qvel: jnp.ndarray             # (nv,)
    ctrl: jnp.ndarray             # (nu,)
    qacc: jnp.ndarray             # (nv,)
    qacc_warmstart: jnp.ndarray   # (nv,)
    qfrc_applied: jnp.ndarray     # (nv,)
    time: jnp.ndarray             # ()

    # Cached kinematics (from the last forward pass).
    xpos: jnp.ndarray             # (nbody, 3)
    xquat: jnp.ndarray            # (nbody, 4)
    xipos: jnp.ndarray            # (nbody, 3)
    geom_xpos: jnp.ndarray        # (ngeom, 3)
    geom_xmat: jnp.ndarray        # (ngeom, 3, 3)
    site_xpos: jnp.ndarray        # (nsite, 3)
    site_xmat: jnp.ndarray        # (nsite, 3, 3)
    subtree_com: jnp.ndarray      # (nbody, 3)

    ten_length: jnp.ndarray       # (nten,)
    actuator_force: jnp.ndarray   # (nu,)
    sensordata: jnp.ndarray       # (nsensordata,)

    efc_force: jnp.ndarray        # (nefc_cap,)
    ncon_active: jnp.ndarray      # () int32 — in-margin contacts BEFORE
                                  #  compaction; > the active cap means
                                  #  compact() silently dropped contacts
                                  #  (debug/parity overflow indicator)
    # NOTE: the full per-slot contact buffer is deliberately NOT carried
    # in Data: at ncon_cap=1020 slots it is ~53 KB/env (dist+pos+frame),
    # i.e. ~216 MB of pure HBM write traffic per substep at 4096 envs,
    # and nothing reads it back between steps.  Contact sets are
    # available from pipeline.forward_core's ForwardOut (contact_full /
    # contacts) for tests and tools.


def make_data(model: Model, dtype=jnp.float64) -> Data:
    """Zero-initialized Data at qpos0 (kinematics not yet computed —
    call physics.forward / pipeline.init to populate caches)."""
    s = model.spec
    z = lambda *shape: jnp.zeros(shape, dtype=dtype)
    return Data(
        qpos=model.qpos0.astype(dtype),
        qvel=z(s.nv),
        ctrl=z(s.nu),
        qacc=z(s.nv),
        qacc_warmstart=z(s.nv),
        qfrc_applied=z(s.nv),
        time=jnp.zeros((), dtype=dtype),
        xpos=z(s.nbody, 3),
        xquat=jnp.tile(jnp.array([1.0, 0, 0, 0], dtype=dtype), (s.nbody, 1)),
        xipos=z(s.nbody, 3),
        geom_xpos=z(s.ngeom, 3),
        geom_xmat=jnp.tile(jnp.eye(3, dtype=dtype), (s.ngeom, 1, 1)),
        site_xpos=z(s.nsite, 3),
        site_xmat=jnp.tile(jnp.eye(3, dtype=dtype), (s.nsite, 1, 1)),
        subtree_com=z(s.nbody, 3),
        ten_length=z(s.nten),
        actuator_force=z(s.nu),
        sensordata=z(s.nsensordata),
        efc_force=z(s.nefc_cap),
        ncon_active=jnp.zeros((), dtype=jnp.int32),
    )
