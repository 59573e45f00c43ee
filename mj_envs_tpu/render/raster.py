"""On-device batched renderer: analytic primitive ray-caster.

TPU-native replacement for the reference's EGL offscreen GL path
(`headless_observer.py:34-52`: `sim.render(640,480)` -> vertical flip ->
128x128 center crop -> optional 64x64 resize).  Instead of rasterizing
640x480 and cropping, the central 128x128 window is ray-cast directly
(identical geometry: the crop of a pinhole image IS a pinhole image with
the same focal length), then box-resized to 64x64.

Geometry: plane / sphere / capsule / cylinder / box analytic
intersections against every geom, closest-hit shading with a headlight
(Lambert + ambient), colors from geom_rgba.  Mesh geoms (visual-only in
this suite, from the broken Adroit submodule — SURVEY.md §2.9) are not
rendered; the hand is drawn from its collision primitives instead.

Everything is jit/vmap-friendly: static geom count, no data-dependent
shapes; images batch over envs with one vmap.

Mesh geoms are supported through `render(..., meshes=MeshInstances)`
(triangle closest-hit, `render/mesh.py`); the four shipped tasks pass
none because the Adroit STLs are absent from the snapshot (broken
submodule — SURVEY.md §2.9) and the hand is drawn from its collision
primitives instead.
"""
from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from ..physics.model import (Model, GEOM_PLANE, GEOM_SPHERE, GEOM_CAPSULE,
                             GEOM_CYLINDER, GEOM_BOX)

BIG = 1e9


class Camera(NamedTuple):
    origin: jnp.ndarray   # (3,)
    rot: jnp.ndarray      # (3, 3) camera-to-world; cam looks along -z
    focal_px: float       # focal length in pixels


def free_camera(lookat, azimuth_deg, elevation_deg, distance,
                fovy_deg=45.0, height_px=480):
    """MuJoCo free-camera convention (mjv_defaultFreeCamera /
    mjv_cameraInModel): forward points from camera to lookat;
    azimuth about +z, elevation negative = looking down."""
    az = jnp.deg2rad(jnp.asarray(azimuth_deg, jnp.float32))
    el = jnp.deg2rad(jnp.asarray(elevation_deg, jnp.float32))
    forward = jnp.stack([jnp.cos(el) * jnp.cos(az),
                         jnp.cos(el) * jnp.sin(az),
                         jnp.sin(el)])
    lookat = jnp.asarray(lookat, jnp.float32)
    origin = lookat - distance * forward
    # camera frame: -z = forward, x = right, y = up
    world_up = jnp.array([0.0, 0.0, 1.0], jnp.float32)
    right = jnp.cross(forward, world_up)
    right = right / jnp.maximum(jnp.linalg.norm(right), 1e-8)
    up = jnp.cross(right, forward)
    rot = jnp.stack([right, up, -forward], axis=1)
    focal = (height_px / 2.0) / jnp.tan(jnp.deg2rad(fovy_deg) / 2.0)
    return Camera(origin=origin, rot=rot, focal_px=focal)


def fixed_camera(cam_xpos, cam_xmat, fovy_deg=45.0, height_px=480):
    """Model-defined camera (MJCF <camera>): mujoco cameras look along
    -z of their frame."""
    focal = (height_px / 2.0) / jnp.tan(jnp.deg2rad(fovy_deg) / 2.0)
    return Camera(origin=jnp.asarray(cam_xpos, jnp.float32),
                  rot=jnp.asarray(cam_xmat, jnp.float32),
                  focal_px=focal)


def _ray_dirs(cam: Camera, h: int, w: int):
    """Rays of the central (h, w) crop; row 0 = TOP of the image
    (the reference flips the GL image so row 0 is top)."""
    ys = (jnp.arange(h, dtype=jnp.float32) - (h - 1) / 2.0)
    xs = (jnp.arange(w, dtype=jnp.float32) - (w - 1) / 2.0)
    yy, xx = jnp.meshgrid(ys, xs, indexing="ij")
    d_cam = jnp.stack([xx / cam.focal_px, -yy / cam.focal_px,
                       -jnp.ones_like(xx)], axis=-1)
    d_world = d_cam @ cam.rot.T
    d_world = d_world / jnp.linalg.norm(d_world, axis=-1, keepdims=True)
    return d_world        # (h, w, 3)


# -- analytic ray-primitive hits: return (t, normal); t=BIG on miss -------

def _hit_plane(o, d, size):
    # local frame: plane z=0, normal +z; only hit from above.
    t = -o[..., 2] / jnp.where(jnp.abs(d[..., 2]) > 1e-9, d[..., 2], 1e-9)
    ok = (t > 1e-4) & (jnp.abs(d[..., 2]) > 1e-9)
    n = jnp.broadcast_to(jnp.array([0.0, 0, 1]), o.shape)
    return jnp.where(ok, t, BIG), n


def _hit_sphere(o, d, size):
    r = size[0]
    b = jnp.sum(o * d, axis=-1)
    c = jnp.sum(o * o, axis=-1) - r * r
    disc = b * b - c
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    t = -b - sq
    ok = (disc > 0) & (t > 1e-4)
    p = o + t[..., None] * d
    return jnp.where(ok, t, BIG), p / jnp.maximum(r, 1e-9)


def _hit_zcyl_side(o, d, r, hl):
    a = d[..., 0] ** 2 + d[..., 1] ** 2
    b = o[..., 0] * d[..., 0] + o[..., 1] * d[..., 1]
    c = o[..., 0] ** 2 + o[..., 1] ** 2 - r * r
    disc = b * b - a * c
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    t = (-b - sq) / jnp.maximum(a, 1e-12)
    z = o[..., 2] + t * d[..., 2]
    ok = (disc > 0) & (t > 1e-4) & (jnp.abs(z) <= hl) & (a > 1e-12)
    p = o + t[..., None] * d
    n = jnp.stack([p[..., 0] / r, p[..., 1] / r,
                   jnp.zeros_like(p[..., 2])], axis=-1)
    return jnp.where(ok, t, BIG), n


def _hit_zdisk(o, d, r, z0, nz):
    t = (z0 - o[..., 2]) / jnp.where(jnp.abs(d[..., 2]) > 1e-9,
                                     d[..., 2], 1e-9)
    p = o + t[..., None] * d
    ok = (t > 1e-4) & (p[..., 0] ** 2 + p[..., 1] ** 2 <= r * r) \
        & (jnp.abs(d[..., 2]) > 1e-9)
    n = jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0]) * nz, o.shape)
    return jnp.where(ok, t, BIG), n


def _min3(t1, n1, t2, n2, t3, n3):
    """Nearest of three candidate hits, by elementwise selects.

    Equivalent to argmin + take_along_axis (first-minimum priority),
    which is how this used to be written — but a take_along_axis whose
    indices vary per PIXEL lowers to a serial gather on TPU: the two
    gathers here were 97% of the whole 128^2x256-env render (4.2
    ms/frame; fusions raster.py:164-180 in the round-5 trace)."""
    t = jnp.minimum(jnp.minimum(t1, t2), t3)
    n = jnp.where((t == t1)[..., None], n1,
                  jnp.where((t == t2)[..., None], n2, n3))
    return t, n


def _hit_cylinder(o, d, size):
    r, hl = size[0], size[1]
    t1, n1 = _hit_zcyl_side(o, d, r, hl)
    t2, n2 = _hit_zdisk(o, d, r, hl, 1.0)
    t3, n3 = _hit_zdisk(o, d, r, -hl, -1.0)
    return _min3(t1, n1, t2, n2, t3, n3)


def _hit_capsule(o, d, size):
    r, hl = size[0], size[1]
    t1, n1 = _hit_zcyl_side(o, d, r, hl)
    # end spheres at z = +-hl
    o_top = o - jnp.array([0.0, 0, 1]) * hl
    o_bot = o + jnp.array([0.0, 0, 1]) * hl
    t2, n2 = _hit_sphere(o_top, d, jnp.stack([r, r, r]))
    t3, n3 = _hit_sphere(o_bot, d, jnp.stack([r, r, r]))
    # sphere hits only valid on their hemisphere
    z2 = o_top[..., 2] + t2 * d[..., 2]
    t2 = jnp.where(z2 >= 0, t2, BIG)
    z3 = o_bot[..., 2] + t3 * d[..., 2]
    t3 = jnp.where(z3 <= 0, t3, BIG)
    return _min3(t1, n1, t2, n2, t3, n3)


def _hit_box(o, d, size):
    inv = 1.0 / jnp.where(jnp.abs(d) > 1e-9, d, 1e-9)
    t0 = (-size - o) * inv
    t1 = (size - o) * inv
    tmin = jnp.minimum(t0, t1)
    tmax = jnp.maximum(t0, t1)
    t_near = jnp.max(tmin, axis=-1)
    t_far = jnp.min(tmax, axis=-1)
    ok = (t_near < t_far) & (t_near > 1e-4)
    p = o + t_near[..., None] * d
    # Entry face = the axis achieving t_near; select it with a
    # first-match cascade (== argmax's first-index tie rule) instead of
    # argmax + take_along_axis — per-pixel gathers serialize on TPU.
    e0 = tmin[..., 0] == t_near
    e1 = (tmin[..., 1] == t_near) & ~e0
    e2 = ~e0 & ~e1
    oh = jnp.stack([e0, e1, e2], axis=-1).astype(o.dtype)
    n = oh * jnp.sign(p)
    return jnp.where(ok, t_near, BIG), n


_HITS = {GEOM_PLANE: _hit_plane, GEOM_SPHERE: _hit_sphere,
         GEOM_CAPSULE: _hit_capsule, GEOM_CYLINDER: _hit_cylinder,
         GEOM_BOX: _hit_box}


class MeshInstances(NamedTuple):
    """Posed mesh geoms for `render` (see `render/mesh.py`)."""
    bank: "object"            # mesh.MeshBank
    meshid: np.ndarray        # (Gm,) static mesh index per instance
    pos: jnp.ndarray          # (Gm, 3) world position
    mat: jnp.ndarray          # (Gm, 3, 3) world orientation
    rgba: jnp.ndarray         # (Gm, 4)


def render(model: Model, geom_xpos, geom_xmat, cam: Camera,
           height: int = 128, width: int = 128,
           light_dir=(0.0, 0.0, -1.0), ambient: float = 0.35,
           meshes: "MeshInstances | None" = None):
    """-> (height, width, 3) float32 in [0, 255] (the reference's
    HeadlessObserver returns float [0,255] images, `:52`)."""
    s = model.spec
    dirs = _ray_dirs(cam, height, width)            # (H, W, 3)
    o_w = cam.origin

    # Group geoms by type (static) and intersect batched.
    gt = np.asarray(s.geom_type)
    best_t = jnp.full((height, width), BIG, jnp.float32)
    best_rgb = jnp.zeros((height, width, 3), jnp.float32)
    best_n = jnp.zeros((height, width, 3), jnp.float32)

    ldir = jnp.asarray(light_dir, jnp.float32)
    ldir = ldir / jnp.linalg.norm(ldir)

    # Winner selection is GATHER-FREE: per-geom world normals/colors are
    # merged by one-hot masked sums over the geom axis instead of
    # argmin + take_along_axis/table-indexing — batched gathers of tiny
    # tables lower to serial per-env loops on TPU and made the renderer
    # ~100x slower than its bandwidth bound (4.6 ms/frame at 256 envs).
    for t_id, fn in _HITS.items():
        gids = np.nonzero(gt == t_id)[0]
        if len(gids) == 0:
            continue
        pos = geom_xpos[gids]                        # (G, 3)
        mat = geom_xmat[gids]                        # (G, 3, 3)
        size = model.geom_size[gids].astype(jnp.float32)
        rgba = model.geom_rgba[gids].astype(jnp.float32)

        def one(p, R, sz):
            o_l = R.T @ (o_w - p)
            d_l = dirs @ R
            o_l = jnp.broadcast_to(o_l, dirs.shape)
            t, n_l = fn(o_l, d_l, sz)
            # rotate the hit normal to world HERE (per geom, no gather)
            n_w = n_l @ R.T
            return t, n_w

        ts, ns_w = jax.vmap(one)(pos, mat, size)     # (G, H, W), (G,H,W,3)
        # hide fully transparent geoms (alpha 0 = visual-off markers)
        visible = rgba[:, 3] > 0.05
        ts = jnp.where(visible[:, None, None], ts, BIG)
        t_grp = jnp.min(ts, axis=0)                  # (H, W)
        win = (ts <= t_grp[None]) & (ts < BIG)       # (G, H, W)
        cnt = jnp.maximum(jnp.sum(win, axis=0), 1)   # ties: average
        winf = win.astype(jnp.float32)
        n_w = jnp.sum(ns_w * winf[..., None], axis=0) / cnt[..., None]
        rgb = jnp.sum(rgba[:, None, None, :3] * winf[..., None],
                      axis=0) / cnt[..., None]
        upd = t_grp < best_t
        best_rgb = jnp.where(upd[..., None], rgb, best_rgb)
        best_n = jnp.where(upd[..., None], n_w, best_n)
        best_t = jnp.where(upd, t_grp, best_t)

    if meshes is not None:
        from .mesh import hit_mesh
        tris_all = meshes.bank.tris[np.asarray(meshes.meshid)]

        def one_mesh(p, R, tris):
            o_l = R.T @ (o_w - p)
            d_l = dirs @ R
            o_l = jnp.broadcast_to(o_l, dirs.shape)
            t, n_l = hit_mesh(o_l, d_l, tris)
            return t, n_l @ R.T

        ts, ns_w = jax.vmap(one_mesh)(
            meshes.pos.astype(jnp.float32),
            meshes.mat.astype(jnp.float32), tris_all)
        visible = meshes.rgba[:, 3] > 0.05
        ts = jnp.where(visible[:, None, None], ts, BIG)
        t_grp = jnp.min(ts, axis=0)
        win = (ts <= t_grp[None]) & (ts < BIG)
        cnt = jnp.maximum(jnp.sum(win, axis=0), 1)
        winf = win.astype(jnp.float32)
        n_w = jnp.sum(ns_w * winf[..., None], axis=0) / cnt[..., None]
        rgb = jnp.sum(
            meshes.rgba.astype(jnp.float32)[:, None, None, :3]
            * winf[..., None], axis=0) / cnt[..., None]
        upd = t_grp < best_t
        best_rgb = jnp.where(upd[..., None], rgb, best_rgb)
        best_n = jnp.where(upd[..., None], n_w, best_n)
        best_t = jnp.where(upd, t_grp, best_t)

    hit = best_t < BIG
    lam = jnp.clip(-jnp.sum(best_n * ldir, axis=-1), 0.0, 1.0)
    shade = ambient + (1.0 - ambient) * lam
    sky = jnp.asarray([0.2, 0.3, 0.4], jnp.float32)
    img = jnp.where(hit[..., None], best_rgb * shade[..., None],
                    sky[None, None, :])
    # float32 [0, 255] like the reference observer output
    # (`headless_observer.py:52` returns float), f32 for the TPU path
    # even under an x64-enabled host process.
    return jnp.clip(img * 255.0, 0.0, 255.0).astype(jnp.float32)


def resize_half(img):
    """128->64 bilinear-by-2 (equivalent to 2x2 box average, matching
    torchvision bilinear downsample by an exact factor of 2)."""
    h, w, c = img.shape
    return img.reshape(h // 2, 2, w // 2, 2, c).mean(axis=(1, 3))


def images_to_observation(img_u8, bit_depth: int, key=None):
    """PlaNet preprocessing (`dependencies/PlaNet env._images_to_
    observation`, used at reference `baselines.py:313`, `train.py:122`):
    quantize to bit_depth, center to [-0.5, 0.5], optional dequant
    noise."""
    x = jnp.floor_divide(img_u8.astype(jnp.float32),
                         2 ** (8 - bit_depth))
    x = x / (2 ** bit_depth) - 0.5
    if key is not None:
        x = x + jax.random.uniform(key, x.shape) / (2 ** bit_depth)
    return x
