"""Triangle-mesh rendering support for the batched ray-caster.

The reference renders the ShadowHand from 11 STL meshes supplied by the
Adroit submodule (`DAPG_assets.xml:2,35-43,58-68`) — visual-only geoms
(class `D_Vizual` => contype=conaffinity=0, SURVEY.md §2.9).  That
submodule is a broken symlink in the snapshot, so the STLs do not exist
here and the four tasks render the hand from its collision primitives
instead (documented deviation, `render/raster.py:12-14`).

This module supplies the capability anyway, so a user with the Adroit
assets (or any MJCF with mesh geoms) gets mesh rendering:

- `load_stl(path)` — minimal binary/ASCII STL reader -> (V, F) arrays.
- `MeshBank` — meshes packed into one padded triangle tensor, indexed
  by mesh id; degenerate padding triangles never hit.
- `hit_mesh(o, d, tris)` — Möller-Trumbore closest-hit over the padded
  triangle set, jit/vmap-friendly (static shapes, masked misses), used
  by `raster.render(..., meshes=...)` as an extra hit group.
"""
from __future__ import annotations

import struct as _struct
from typing import List, NamedTuple, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp

BIG = 1e9


def load_stl(path: str, scale: float = 1.0) -> Tuple[np.ndarray, np.ndarray]:
    """Read an STL file -> (vertices (V, 3) f32, faces (F, 3) i32).

    Handles both binary and ASCII STL (the Adroit meshes are binary;
    MJCF applies `scale` per `<mesh scale=...>`, default 0.001 in this
    suite, `DAPG_assets.xml:11`).  Vertices are de-duplicated exactly.
    """
    with open(path, "rb") as f:
        head = f.read(5)
        f.seek(0)
        if head == b"solid":
            tris = _read_ascii_stl(f.read().decode("ascii", "replace"))
        else:
            f.seek(80)
            (n,) = _struct.unpack("<I", f.read(4))
            raw = np.frombuffer(f.read(n * 50), dtype=np.uint8)
            raw = raw.reshape(n, 50)
            tris = raw[:, 12:48].copy().view(np.float32).reshape(n, 3, 3)
    verts, inv = np.unique(tris.reshape(-1, 3), axis=0,
                           return_inverse=True)
    faces = inv.reshape(-1, 3).astype(np.int32)
    return (verts * scale).astype(np.float32), faces


def _read_ascii_stl(text: str) -> np.ndarray:
    pts: List[List[float]] = []
    for line in text.splitlines():
        t = line.split()
        if t and t[0] == "vertex":
            pts.append([float(t[1]), float(t[2]), float(t[3])])
    return np.asarray(pts, np.float32).reshape(-1, 3, 3)


class MeshBank(NamedTuple):
    """All meshes packed into one (nmesh, tmax, 3, 3) tensor.

    Padding slots hold a degenerate triangle (all three vertices at the
    same far-away point) whose intersection test always misses.
    """
    tris: jnp.ndarray        # (nmesh, tmax, 3, 3) f32, local frame
    ntri: np.ndarray         # (nmesh,) i32 actual triangle counts

    @staticmethod
    def pack(meshes: Sequence[Tuple[np.ndarray, np.ndarray]]) -> "MeshBank":
        """meshes: list of (verts (V,3), faces (F,3)) as from load_stl."""
        tmax = max(int(f.shape[0]) for _, f in meshes)
        out = np.full((len(meshes), tmax, 3, 3), 1e6, np.float32)
        ntri = np.zeros(len(meshes), np.int32)
        for i, (v, f) in enumerate(meshes):
            out[i, : f.shape[0]] = v[f]
            ntri[i] = f.shape[0]
        return MeshBank(tris=jnp.asarray(out), ntri=ntri)


def hit_mesh(o, d, tris):
    """Möller-Trumbore closest hit.

    o, d: (..., 3) ray origins/directions in the geom's local frame;
    tris: (T, 3, 3).  Returns (t, n) with t=BIG on miss; n is the
    (unnormalized-winding) geometric normal flipped toward the ray.
    """
    v0 = tris[:, 0]                                    # (T, 3)
    e1 = tris[:, 1] - v0
    e2 = tris[:, 2] - v0

    def one_tri(v0i, e1i, e2i):
        p = jnp.cross(d, e2i)                          # (..., 3)
        det = jnp.sum(e1i * p, axis=-1)
        inv = 1.0 / jnp.where(jnp.abs(det) > 1e-12, det, 1e-12)
        s = o - v0i
        u = jnp.sum(s * p, axis=-1) * inv
        q = jnp.cross(s, e1i)
        v = jnp.sum(d * q, axis=-1) * inv
        t = jnp.sum(e2i * q, axis=-1) * inv
        ok = ((jnp.abs(det) > 1e-12) & (u >= 0.0) & (v >= 0.0)
              & (u + v <= 1.0) & (t > 1e-4))
        return jnp.where(ok, t, BIG)

    ts = jax.vmap(one_tri)(v0, e1, e2)                 # (T, ...)
    i = jnp.argmin(ts, axis=0)                         # (...)
    t = jnp.min(ts, axis=0)
    n = jnp.cross(e1, e2)                              # (T, 3)
    n = n / jnp.maximum(jnp.linalg.norm(n, axis=-1, keepdims=True), 1e-12)
    n_hit = n[i]                                       # (..., 3)
    # two-sided shading: flip the normal against the ray
    n_hit = jnp.where(jnp.sum(n_hit * d, axis=-1, keepdims=True) > 0,
                      -n_hit, n_hit)
    return t, n_hit
