"""Model builder: MjcfSpec -> (ModelSpec, Model).

Host-side compilation pass.  Enumerates the static collision-candidate pair
list (MuJoCo contype/conaffinity + weld/parent filtering rules, explicit
<pair>/<exclude> rows — reference semantics at `DAPG_assets.xml:71-91`,
`DAPG_hammer.xml:29-31`), expands pairs into fixed contact slots, lays out
the constraint rows statically, and bootstraps the qpos0 inverse-weight
parameters used by constraint regularization.
"""
from __future__ import annotations

from typing import Dict, List, Tuple

import os

import numpy as np
import jax
import jax.numpy as jnp

from ..physics.model import (
    Model, ModelSpec,
    EFC_FRICTION_DOF, EFC_LIMIT_JOINT, EFC_LIMIT_TENDON, EFC_CONTACT,
    GEOM_PLANE, GEOM_MESH, JNT_HINGE,
)
from . import parser as P

# Max contacts the narrowphase emits per geom-type pair: single source of
# truth is the collision driver's dispatch table (slot budget AFTER the
# driver's within-pair candidate squeeze, e.g. box_box 24 -> 8).
from ..physics.collision.driver import _SLOTS as _NARROWPHASE_SLOTS

_MAXCON: Dict[Tuple[int, int], int] = dict(_NARROWPHASE_SLOTS)


def _contact_rows(condim: int) -> int:
    """Pyramidal-cone constraint rows per contact."""
    if condim == 1:
        return 1
    return 2 * (condim - 1)


def build(spec: P.MjcfSpec, dtype=np.float64,
          xml_path: str | None = None) -> Model:
    # Drop mesh geoms: visual-only in this suite (class D_Vizual =>
    # contype=conaffinity=0, and every meshed body has an explicit
    # <inertial>).  The broken Adroit submodule means the STLs are absent;
    # rendering uses the primitive geoms.  Filtering here also aligns geom
    # ids with the sanitized mujoco oracle used in differential tests.
    import copy
    spec = copy.copy(spec)
    spec.geoms = [g for g in spec.geoms if g.gtype != GEOM_MESH]
    # mujoco numbers geoms/sites/cameras grouped by body id (stable within a
    # body); document order differs when worldbody elements (uprightwall,
    # relocate's target site) appear after body subtrees.
    spec.geoms = sorted(spec.geoms, key=lambda g: g.body)
    spec.sites = sorted(spec.sites, key=lambda st: st.body)
    spec.cameras = sorted(spec.cameras, key=lambda c: c.body)

    nbody = len(spec.bodies)
    njnt = len(spec.joints)
    nv = nq = njnt  # all joints are 1-dof hinge/slide
    ngeom = len(spec.geoms)
    nsite = len(spec.sites)
    ncam = len(spec.cameras)
    nten = len(spec.tendons)
    nu = len(spec.actuators)

    body_parentid = np.array([b.parent for b in spec.bodies], dtype=np.int32)
    body_parentid[0] = 0
    body_mocap = np.array([b.mocap for b in spec.bodies])

    # rootid: top-level body (direct child of world) above each body.
    body_rootid = np.zeros(nbody, dtype=np.int32)
    for b in range(1, nbody):
        r = b
        while body_parentid[r] != 0:
            r = body_parentid[r]
        body_rootid[b] = r

    jnt_bodyid = np.array([j.body for j in spec.joints], dtype=np.int32)
    jnt_type = np.array([j.jtype for j in spec.joints], dtype=np.int32)
    jnt_limited = np.array([j.limited for j in spec.joints])

    # weldid: nearest ancestor (or self) that carries a joint; 0 = world weld.
    has_joint = np.zeros(nbody, dtype=bool)
    for j in spec.joints:
        has_joint[j.body] = True
    body_weldid = np.zeros(nbody, dtype=np.int32)
    for b in range(1, nbody):
        body_weldid[b] = b if has_joint[b] else body_weldid[body_parentid[b]]

    # Ancestor chains and masks.
    def ancestors(b: int) -> List[int]:
        chain = []
        while b != 0:
            chain.append(b)
            b = int(body_parentid[b])
        return chain  # excludes world, deepest first

    subtree_mask = np.zeros((nbody, nbody), dtype=bool)
    for b in range(nbody):
        subtree_mask[b, b] = True
    for b in range(nbody - 1, 0, -1):
        subtree_mask[body_parentid[b]] |= subtree_mask[b]
    subtree_mask[0] = True  # world subtree = everything

    body_dofmask = np.zeros((nbody, nv), dtype=bool)
    for b in range(1, nbody):
        anc = set(ancestors(b))
        for i in range(njnt):
            if jnt_bodyid[i] in anc:
                body_dofmask[b, i] = True

    ancestor_mask = np.zeros((nv, nv), dtype=bool)
    for jdof in range(nv):
        for idof in range(jdof + 1):
            bi, bj = jnt_bodyid[idof], jnt_bodyid[jdof]
            if bi == bj or body_dofmask[bj, idof]:
                ancestor_mask[idof, jdof] = True

    dof_strict_pred = np.zeros((nv, nv), dtype=bool)
    for jdof in range(nv):
        for idof in range(jdof):
            if ancestor_mask[idof, jdof]:
                dof_strict_pred[jdof, idof] = True

    geom_bodyid = np.array([g.body for g in spec.geoms], dtype=np.int32)
    geom_type = np.array([g.gtype for g in spec.geoms], dtype=np.int32)

    # ---------------- collision pair enumeration ----------------
    name2geom = {g.name: i for i, g in enumerate(spec.geoms)
                 if g.name is not None}
    name2body = {b.name: i for i, b in enumerate(spec.bodies)
                 if b.name is not None}
    excl = set()
    for b1, b2 in spec.excludes:
        i1, i2 = name2body[b1], name2body[b2]
        excl.add((min(i1, i2), max(i1, i2)))

    explicit = set()
    pair_list = []  # (g1, g2, condim, friction5, margin, gap, solref, solimp)
    for pr in spec.pairs:
        g1, g2 = name2geom[pr.geom1], name2geom[pr.geom2]
        if geom_type[g1] > geom_type[g2]:
            g1, g2 = g2, g1
        # NB: duplicate <pair> rows (DAPG_assets.xml:87-88) are kept —
        # mujoco keeps them too, and the duplicated constraint is part of
        # the reference dynamics.
        explicit.add((min(g1, g2), max(g1, g2)))
        pair_list.append((g1, g2, pr.condim, pr.friction.copy(), pr.margin,
                          pr.gap, pr.solref.copy(), pr.solimp.copy(), True))

    def dyn_params(ga: P.Geom, gb: P.Geom):
        """MuJoCo dynamic pair parameter mixing (mj_contactParam)."""
        if ga.priority != gb.priority:
            hi = ga if ga.priority > gb.priority else gb
            fr = hi.friction
            friction5 = np.array([fr[0], fr[0], fr[1], fr[2], fr[2]])
            # mj_collideGeoms SUMS the two geoms' margins and gaps
            # (verified vs oracle: 0.0005+0.0005 -> includemargin 0.001).
            return (hi.condim, friction5, ga.margin + gb.margin,
                    ga.gap + gb.gap, hi.solref.copy(), hi.solimp.copy())
        condim = max(ga.condim, gb.condim)
        mix1, mix2 = ga.solmix, gb.solmix
        if mix1 >= 1e-15 and mix2 >= 1e-15:
            w1 = mix1 / (mix1 + mix2)
        elif mix1 < 1e-15 and mix2 < 1e-15:
            w1 = 0.5
        elif mix1 < 1e-15:
            w1 = 0.0
        else:
            w1 = 1.0
        w2 = 1.0 - w1
        if ga.solref[0] > 0 and gb.solref[0] > 0:
            solref = w1 * ga.solref + w2 * gb.solref
        else:
            solref = np.minimum(ga.solref, gb.solref)
        solimp = w1 * ga.solimp + w2 * gb.solimp
        fr = np.maximum(ga.friction, gb.friction)
        friction5 = np.array([fr[0], fr[0], fr[1], fr[2], fr[2]])
        return (condim, friction5, ga.margin + gb.margin,
                ga.gap + gb.gap, solref, solimp)

    for g1 in range(ngeom):
        for g2 in range(g1 + 1, ngeom):
            if (min(g1, g2), max(g1, g2)) in explicit:
                continue
            ga, gb = spec.geoms[g1], spec.geoms[g2]
            if ga.gtype == GEOM_MESH or gb.gtype == GEOM_MESH:
                continue  # meshes are visual-only in this suite
            if ga.gtype == GEOM_PLANE and gb.gtype == GEOM_PLANE:
                continue
            t1 = (ga.contype & gb.conaffinity) != 0
            t2 = (gb.contype & ga.conaffinity) != 0
            if not (t1 or t2):
                continue
            b1, b2 = geom_bodyid[g1], geom_bodyid[g2]
            w1, w2 = body_weldid[b1], body_weldid[b2]
            if w1 == w2:
                continue
            # parent-child weld filter (parent == world allowed).
            wp1 = body_weldid[body_parentid[w1]] if w1 else -1
            wp2 = body_weldid[body_parentid[w2]] if w2 else -1
            if (w1 != 0 and wp1 == w2 and w2 != 0) or \
               (w2 != 0 and wp2 == w1 and w1 != 0):
                continue
            if (min(b1, b2), max(b1, b2)) in excl:
                continue
            a, b = (g1, g2) if geom_type[g1] <= geom_type[g2] else (g2, g1)
            condim, friction5, margin, gap, solref, solimp = dyn_params(
                spec.geoms[a], spec.geoms[b])
            pair_list.append((a, b, condim, friction5, margin, gap,
                              solref, solimp, False))

    # Order pairs by geom-type group (stable): the narrowphase driver then
    # writes each type-group's results into a CONTIGUOUS slot range and
    # assembles the contact buffer by concatenation — TPU scatters into
    # interleaved slots dominated collide() cost (48ms -> sub-ms for
    # box-box at 1024 envs).
    pair_list.sort(key=lambda p: (geom_type[p[0]], geom_type[p[1]]))

    npair = len(pair_list)
    pair_geom1 = np.array([p[0] for p in pair_list], dtype=np.int32)
    pair_geom2 = np.array([p[1] for p in pair_list], dtype=np.int32)
    pair_condim = np.array([p[2] for p in pair_list], dtype=np.int32)
    pair_friction = np.stack([p[3] for p in pair_list]) if npair else \
        np.zeros((0, 5))
    pair_margin = np.array([p[4] for p in pair_list])
    pair_gap = np.array([p[5] for p in pair_list])
    pair_solref = np.stack([p[6] for p in pair_list]) if npair else \
        np.zeros((0, 2))
    pair_solimp = np.stack([p[7] for p in pair_list]) if npair else \
        np.zeros((0, 5))
    pair_explicit = np.array([p[8] for p in pair_list], dtype=bool)

    # ---------------- contact slots ----------------
    con_pairid, con_geom1, con_geom2, con_condim = [], [], [], []
    for pid in range(npair):
        t1, t2 = geom_type[pair_geom1[pid]], geom_type[pair_geom2[pid]]
        maxcon = _MAXCON[(min(t1, t2), max(t1, t2))]
        for _ in range(maxcon):
            con_pairid.append(pid)
            con_geom1.append(pair_geom1[pid])
            con_geom2.append(pair_geom2[pid])
            con_condim.append(pair_condim[pid])
    ncon_cap = len(con_pairid)
    con_pairid = np.array(con_pairid, dtype=np.int32)
    con_geom1 = np.array(con_geom1, dtype=np.int32)
    con_geom2 = np.array(con_geom2, dtype=np.int32)
    con_condim = np.array(con_condim, dtype=np.int32)

    # ---------------- constraint row layout ----------------
    dof_frictionloss = np.array([j.frictionloss for j in spec.joints])
    ten_limited = np.array([t.limited for t in spec.tendons], dtype=bool)

    efc_type, efc_id, efc_conadr, efc_condir = [], [], [], []
    for i in range(nv):
        if dof_frictionloss[i] > 0:
            efc_type.append(EFC_FRICTION_DOF)
            efc_id.append(i)
            efc_conadr.append(-1)
            efc_condir.append(-1)
    for j in range(njnt):
        if jnt_limited[j]:
            efc_type.append(EFC_LIMIT_JOINT)
            efc_id.append(j)
            efc_conadr.append(-1)
            efc_condir.append(-1)
    for t in range(nten):
        if ten_limited[t]:
            efc_type.append(EFC_LIMIT_TENDON)
            efc_id.append(t)
            efc_conadr.append(-1)
            efc_condir.append(-1)
    for c in range(ncon_cap):
        for d in range(_contact_rows(int(con_condim[c]))):
            efc_type.append(EFC_CONTACT)
            efc_id.append(c)
            efc_conadr.append(c)
            efc_condir.append(d)
    nefc_cap = len(efc_type)

    # ---------------- tendons / actuators / sensors ----------------
    name2jnt = {j.name: i for i, j in enumerate(spec.joints)
                if j.name is not None}
    ten_coef = np.zeros((nten, nv))
    for t, tend in enumerate(spec.tendons):
        for jname, coef in tend.joints:
            ten_coef[t, name2jnt[jname]] = coef

    act_trnid = np.array([name2jnt[a.joint] for a in spec.actuators],
                         dtype=np.int32)
    act_biastype = np.array(
        [1 if a.biastype == "affine" else 0 for a in spec.actuators],
        dtype=np.int32)

    name2act = {a.name: i for i, a in enumerate(spec.actuators)
                if a.name is not None}
    name2site = {st.name: i for i, st in enumerate(spec.sites)
                 if st.name is not None}
    sensors = []
    adr = 0
    for sn in spec.sensors:
        if sn.stype == "actuatorfrc":
            obj = name2act[sn.obj]
        elif sn.stype == "touch":
            obj = name2site[sn.obj]
        else:  # jointpos
            obj = name2jnt[sn.obj]
        sensors.append((sn.stype, obj, adr, 1))
        adr += 1
    nsensordata = adr

    names = {
        "body": name2body,
        "joint": name2jnt,
        "geom": name2geom,
        "site": name2site,
        "actuator": name2act,
        "sensor": {sn.name: i for i, sn in enumerate(spec.sensors)},
        "camera": {c.name: i for i, c in enumerate(spec.cameras)
                   if c.name is not None},
        "tendon": {t.name: i for i, t in enumerate(spec.tendons)
                   if t.name is not None},
    }

    mspec = ModelSpec(
        nq=nq, nv=nv, nu=nu, nbody=nbody, njnt=njnt, ngeom=ngeom,
        nsite=nsite, ncam=ncam, nten=nten, nsensor=len(spec.sensors),
        nsensordata=nsensordata, npair=npair, ncon_cap=ncon_cap,
        nefc_cap=nefc_cap,
        body_parentid=body_parentid, body_rootid=body_rootid,
        body_weldid=body_weldid, body_mocap=body_mocap,
        jnt_bodyid=jnt_bodyid, jnt_type=jnt_type, jnt_limited=jnt_limited,
        jnt_qposadr=np.arange(njnt, dtype=np.int32),
        geom_bodyid=geom_bodyid, geom_type=geom_type,
        geom_condim=np.array([g.condim for g in spec.geoms], dtype=np.int32),
        geom_contype=np.array([g.contype for g in spec.geoms],
                              dtype=np.int32),
        geom_conaffinity=np.array([g.conaffinity for g in spec.geoms],
                                  dtype=np.int32),
        geom_priority=np.array([g.priority for g in spec.geoms],
                               dtype=np.int32),
        site_bodyid=np.array([st.body for st in spec.sites] or [],
                             dtype=np.int32),
        site_type=np.array([st.stype for st in spec.sites] or [],
                           dtype=np.int32),
        cam_bodyid=np.array([c.body for c in spec.cameras] or [],
                            dtype=np.int32),
        act_trnid=act_trnid, act_biastype=act_biastype,
        ten_limited=ten_limited,
        dof_hasfrictionloss=dof_frictionloss > 0,
        ancestor_mask=ancestor_mask, subtree_mask=subtree_mask,
        body_dofmask=body_dofmask, dof_strict_pred=dof_strict_pred,
        pair_geom1=pair_geom1, pair_geom2=pair_geom2,
        pair_condim=pair_condim, pair_explicit=pair_explicit,
        con_pairid=con_pairid, con_geom1=con_geom1, con_geom2=con_geom2,
        con_condim=con_condim,
        efc_type=np.array(efc_type, dtype=np.int32),
        efc_id=np.array(efc_id, dtype=np.int32),
        efc_conadr=np.array(efc_conadr, dtype=np.int32),
        efc_condir=np.array(efc_condir, dtype=np.int32),
        sensors=tuple(sensors),
        names=names,
        timestep=spec.option.timestep,
        gravity=spec.option.gravity.copy(),
        iterations=spec.option.iterations,
        noslip_iterations=spec.option.noslip_iterations,
        tolerance=spec.option.tolerance,
        noslip_tolerance=spec.option.noslip_tolerance,
        impratio=spec.option.impratio,
        model_name=spec.model_name,
    )

    # Build every leaf as NUMPY and ship the whole pytree in ONE
    # device_put at the end: per-leaf jnp.asarray through the axon TPU
    # tunnel costs a round-trip each (~45 leaves made `make()` take
    # minutes; measured 225 s at round 2 start).
    j = lambda x: np.asarray(x, dtype=dtype)
    model = Model(
        spec=mspec,
        qpos0=j(np.array([jt.ref for jt in spec.joints])),
        body_pos=j(np.stack([b.pos for b in spec.bodies])),
        body_quat=j(np.stack([b.quat for b in spec.bodies])),
        body_ipos=j(np.stack([b.ipos for b in spec.bodies])),
        body_iquat=j(np.stack([b.iquat for b in spec.bodies])),
        body_mass=j(np.array([b.mass for b in spec.bodies])),
        body_inertia=j(np.stack([b.inertia for b in spec.bodies])),
        body_invweight0=j(np.zeros((nbody, 2))),
        jnt_pos=j(np.stack([jt.pos for jt in spec.joints])),
        jnt_axis=j(np.stack([jt.axis for jt in spec.joints])),
        jnt_range=j(np.stack([jt.range for jt in spec.joints])),
        jnt_margin=j(np.array([jt.margin for jt in spec.joints])),
        jnt_stiffness=j(np.array([jt.stiffness for jt in spec.joints])),
        jnt_springref=j(np.array([jt.springref for jt in spec.joints])),
        jnt_solref_lim=j(np.stack([jt.solref_lim for jt in spec.joints])),
        jnt_solimp_lim=j(np.stack([jt.solimp_lim for jt in spec.joints])),
        dof_damping=j(np.array([jt.damping for jt in spec.joints])),
        dof_armature=j(np.array([jt.armature for jt in spec.joints])),
        dof_frictionloss=j(dof_frictionloss),
        dof_solref_fri=j(np.stack([jt.solref_fri for jt in spec.joints])),
        dof_solimp_fri=j(np.stack([jt.solimp_fri for jt in spec.joints])),
        dof_invweight0=j(np.zeros(nv)),
        geom_pos=j(np.stack([g.pos for g in spec.geoms])),
        geom_quat=j(np.stack([g.quat for g in spec.geoms])),
        geom_size=j(np.stack([g.size for g in spec.geoms])),
        geom_rgba=j(np.stack([g.rgba for g in spec.geoms])),
        site_pos=j(np.stack([st.pos for st in spec.sites])),
        site_quat=j(np.stack([st.quat for st in spec.sites])),
        site_size=j(np.stack([st.size for st in spec.sites])),
        cam_pos=j(np.stack([c.pos for c in spec.cameras])
                  if ncam else np.zeros((0, 3))),
        cam_quat=j(np.stack([c.quat for c in spec.cameras])
                   if ncam else np.zeros((0, 4))),
        ten_coef=j(ten_coef),
        ten_range=j(np.stack([t.range for t in spec.tendons])
                    if nten else np.zeros((0, 2))),
        ten_margin=j(np.array([t.margin for t in spec.tendons])),
        ten_solref_lim=j(np.stack([t.solref_lim for t in spec.tendons])
                         if nten else np.zeros((0, 2))),
        ten_solimp_lim=j(np.stack([t.solimp_lim for t in spec.tendons])
                         if nten else np.zeros((0, 5))),
        ten_invweight0=j(np.zeros(nten)),
        act_gainprm=j(np.stack([a.gainprm for a in spec.actuators])),
        act_biasprm=j(np.stack([a.biasprm for a in spec.actuators])),
        act_ctrlrange=j(np.stack([a.ctrlrange for a in spec.actuators])),
        act_forcerange=j(np.stack([a.forcerange for a in spec.actuators])),
        act_forcelimited=np.array([a.forcelimited
                                   for a in spec.actuators]),
        pair_friction=j(pair_friction),
        pair_margin=j(pair_margin),
        pair_gap=j(pair_gap),
        pair_solref=j(pair_solref),
        pair_solimp=j(pair_solimp),
    )

    import jax
    model = jax.device_put(model)   # one batched host->device transfer
    return _set_invweights(model, xml_path=xml_path)


_INVWEIGHT_CACHE_VERSION = 1


def _invweight_cache_path(model: Model) -> str:
    """Disk-cache key for the invweights: a hash of every model quantity
    they depend on (qpos0, body tree + inertial params, joint geometry,
    tendon coefficients, topology) plus dtype and a version counter.

    mj_setConst runs once per model; as a jitted XLA program it costs a
    ~30 s fresh compile per process on hosts where the persistent
    compile cache is off (see `mj_envs_tpu.enable_compilation_cache` —
    XLA:CPU serialization crashes), which dominated `envs.make()`.
    Caching the three tiny RESULT arrays instead of the program makes
    make() sub-second everywhere and is dtype-exact."""
    import hashlib
    s = model.spec
    h = hashlib.sha256()
    h.update(str(_INVWEIGHT_CACHE_VERSION).encode())
    h.update(str(model.qpos0.dtype).encode())
    for a in (model.qpos0, model.body_pos, model.body_quat,
              model.body_ipos, model.body_iquat, model.body_mass,
              model.body_inertia, model.jnt_pos, model.jnt_axis,
              model.ten_coef, model.dof_armature):
        h.update(np.asarray(a).tobytes())
    for a in (s.body_parentid, s.jnt_bodyid, s.jnt_type, s.jnt_qposadr):
        h.update(np.asarray(a).tobytes())
    cache_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__)))), ".jax_cache", "invweights")
    return os.path.join(cache_dir, h.hexdigest()[:24] + ".npz")


def _invweight_asset_path(model: Model) -> str:
    """Committed copy of the invweight results (tools/gen_invweights.py):
    unlike `.jax_cache/` these survive a fresh clone, so `envs.make()` on
    a cold TPU machine never pays the multi-minute tunnel compile of the
    mj_setConst program (round-3 measurement: 343 s through axon)."""
    base = os.path.basename(_invweight_cache_path(model))
    return os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "assets", "invweights", base)


def _load_invweights(model: Model, path: str) -> Model | None:
    try:
        with np.load(path) as z:
            return model.replace(
                dof_invweight0=jnp.asarray(z["dof"], model.qpos0.dtype),
                body_invweight0=jnp.asarray(z["body"], model.qpos0.dtype),
                ten_invweight0=jnp.asarray(z["ten"], model.qpos0.dtype))
    except (OSError, KeyError):
        return None


def _invweights_via_cpu_subprocess(xml_path: str, dtype) -> bool:
    """Recompute the invweights for (xml_path, dtype) in a CPU child and
    populate the .jax_cache npz.  Returns True on success.

    Used when a non-CPU (axon/TPU) process misses both caches: computing
    in-process would compile mj_setConst through the tunnel (minutes),
    and CPU-committed arrays inside an axon process degrade later TPU
    dispatch (see `_set_invweights_jit`); a throwaway CPU child has
    neither problem."""
    import subprocess
    import sys
    env = dict(os.environ)
    try:
        from ..utils.hostcpu import scrub_axon_env
        env = scrub_axon_env(env)
    except Exception:
        pass
    env["JAX_PLATFORMS"] = "cpu"
    # x64 so an f64 request stays f64 on the child (f32 builds carry
    # explicit dtypes and are unaffected).
    env["JAX_ENABLE_X64"] = "1"
    code = ("import sys; "
            "from mj_envs_tpu.utils.hostcpu import pin_cpu; pin_cpu(); "
            "from mj_envs_tpu.mjcf import builder as B; "
            "import numpy as np; "
            "B.build_from_xml(sys.argv[1], dtype=np.dtype(sys.argv[2]))")
    try:
        r = subprocess.run(
            [sys.executable, "-c", code, xml_path, np.dtype(dtype).name],
            env=env, timeout=600, capture_output=True)
        return r.returncode == 0
    except (subprocess.TimeoutExpired, OSError):
        return False


def _set_invweights(model: Model, xml_path: str | None = None) -> Model:
    import jax
    path = _invweight_cache_path(model)
    for p in (path, _invweight_asset_path(model)):
        got = _load_invweights(model, p)
        if got is not None:
            return got
    if xml_path is not None and jax.default_backend() != "cpu":
        if _invweights_via_cpu_subprocess(xml_path, model.qpos0.dtype):
            got = _load_invweights(model, path)
            if got is not None:
                return got
    model = _set_invweights_jit(model)
    try:
        os.makedirs(os.path.dirname(path), exist_ok=True)
        tmp = path + f".{os.getpid()}.tmp.npz"   # np.savez keeps .npz names
        np.savez(tmp, dof=np.asarray(model.dof_invweight0),
                 body=np.asarray(model.body_invweight0),
                 ten=np.asarray(model.ten_invweight0))
        os.replace(tmp, path)        # atomic under concurrent builds
    except OSError:
        pass
    return model


def _set_invweights_jit(model: Model) -> Model:
    """Compute dof/body/tendon inverse weights at qpos0 (mj_setConst).

    Runs on the DEFAULT device on purpose: creating even one CPU-committed
    array inside a TPU (axon) process permanently degrades every later
    TPU dispatch in that process to ~50ms (measured; likely the plugin
    drops to a synchronous interop mode).  CPU/f64 parity processes set
    the CPU default device globally, so they still get exact invweights;
    TPU processes compute them in f32, which only perturbs constraint
    regularization at ~1e-7 relative.

    Jitted into ONE XLA program: run eagerly, the unrolled kinematics +
    CRB graph is hundreds of tiny dispatches, each a tunnel round-trip
    under the axon plugin (this was most of the 225 s `make()` stall).
    The compiled program lands in the persistent cache, so reruns are
    instant."""
    import jax
    return jax.jit(_set_invweights_impl)(model)


def _set_invweights_impl(model: Model) -> Model:
    from ..physics import kinematics as K
    from ..physics import dynamics as D

    s = model.spec
    kin = K.kinematics(model, model.qpos0)
    M = D.crb(model, kin)
    Minv = jnp.linalg.inv(M)
    dof_invweight0 = jnp.diag(Minv)

    # Body invweights from com Jacobians.
    jacp, jacr = K.point_jacobian(
        model, kin, kin.xipos, jnp.arange(s.nbody))
    At = jnp.einsum("bki,ij,blj->bkl", jacp, Minv, jacp)
    Ar = jnp.einsum("bki,ij,blj->bkl", jacr, Minv, jacr)
    tr = lambda A: (A[..., 0, 0] + A[..., 1, 1] + A[..., 2, 2]) / 3.0
    body_invweight0 = jnp.stack([tr(At), tr(Ar)], axis=-1)

    if s.nten:
        ten_invweight0 = jnp.einsum(
            "ti,ij,tj->t", model.ten_coef, Minv, model.ten_coef)
    else:
        ten_invweight0 = model.ten_invweight0

    return model.replace(
        dof_invweight0=dof_invweight0,
        body_invweight0=body_invweight0,
        ten_invweight0=ten_invweight0,
    )


def build_from_xml(path: str, dtype=np.float64) -> Model:
    return build(P.parse_mjcf(path), dtype=dtype, xml_path=path)
