"""Task-environment registry (mirrors the reference gym registration,
`mj_envs_vision/__init__.py:4-28`: hammer-v0 / door-v0 / pen-v0 /
relocate-v0 with episode caps 200/200/100/200)."""
from __future__ import annotations

from typing import Optional

from .base import AdroitEnv, EnvState, ModelVar
from .hammer import HammerEnv
from .door import DoorEnv
from .pen import PenEnv
from .relocate import RelocateEnv

_REGISTRY = {
    "hammer-v0": HammerEnv,
    "door-v0": DoorEnv,
    "pen-v0": PenEnv,
    "relocate-v0": RelocateEnv,
    # bare task names accepted too
    "hammer": HammerEnv,
    "door": DoorEnv,
    "pen": PenEnv,
    "relocate": RelocateEnv,
}


def make(env_id: str, variation_type: Optional[str] = None,
         **kwargs) -> AdroitEnv:
    if env_id not in _REGISTRY:
        raise ValueError(
            f"Unknown env '{env_id}'; available: "
            f"{sorted(k for k in _REGISTRY if k.endswith('-v0'))}")
    return _REGISTRY[env_id](variation_type=variation_type, **kwargs)


__all__ = ["make", "AdroitEnv", "EnvState", "ModelVar", "HammerEnv",
           "DoorEnv", "PenEnv", "RelocateEnv"]
