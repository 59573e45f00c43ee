"""Checkpoint / resume.

The reference checkpoints per-policy artifacts (`baselines.py:149-165,
241-260`: SB3 .zip, PlaNet .pt, mjrl pickle) every `checkpoint_interval`
episodes (`train.py:77-79,157-159`) and resumes from the latest file by
sorted name (`baselines.py:152-156`).  TPU-native equivalent: one
orbax-style checkpoint of the full pytree (params, opt state, batched env
state, RNG) — here via flax serialization to a single msgpack file, which
round-trips any jittable pytree and is host-shardable later.
"""
from __future__ import annotations

import os
import re
from typing import Any, Optional

import jax
from flax import serialization


def save(path: str, tree: Any) -> str:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    host_tree = jax.tree_util.tree_map(
        lambda x: jax.device_get(x) if hasattr(x, "device") or
        hasattr(x, "devices") else x, tree)
    with open(path, "wb") as f:
        f.write(serialization.to_bytes(host_tree))
    return path


def restore(path: str, target: Any) -> Any:
    """Restore into a pytree of the same structure (`target` supplies
    structure + dtypes, like the reference's load-into-model pattern)."""
    with open(path, "rb") as f:
        return serialization.from_bytes(target, f.read())


_CKPT_RE = re.compile(r"ckpt_(\d+)\.msgpack$")


def checkpoint_path(directory: str, step: int) -> str:
    return os.path.join(directory, f"ckpt_{step:08d}.msgpack")


def latest(directory: str) -> Optional[str]:
    """Latest checkpoint by step (reference resumes 'latest by sorted
    filename', `baselines.py:152-156`)."""
    if not os.path.isdir(directory):
        return None
    best, best_step = None, -1
    for name in os.listdir(directory):
        mt = _CKPT_RE.search(name)
        if mt and int(mt.group(1)) > best_step:
            best_step = int(mt.group(1))
            best = os.path.join(directory, name)
    return best
