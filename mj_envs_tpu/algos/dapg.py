"""Loader for the reference's pretrained DAPG policies.

The four pickles (`mj_envs_vision/algos/dapg_pretrained/*.pickle`, loaded
by `MLPBaseline.load`, reference `baselines.py:67-77`) contain mjrl
`gaussian_mlp.MLP` objects wrapping a torch `FCNetwork`
((obs-in_shift)/(in_scale+1e-8) -> tanh MLP (32,32) -> *out_scale +
out_shift) plus a state-independent log_std.  mjrl is not installed here,
so a stub-substituting Unpickler extracts the weights, which are converted
to a pure-JAX policy.  These golden policies are the behavioral test
oracles (SURVEY.md §2.11).
"""
from __future__ import annotations

import pickle
from typing import Any, Callable, Dict, Tuple

import numpy as np
import jax
import jax.numpy as jnp


class _Stub:
    def __init__(self, *a, **k):
        pass

    def __setstate__(self, state):
        self.__dict__["_state"] = state


_made: Dict[str, type] = {}


def _make_stub(module: str, name: str) -> type:
    key = f"{module}.{name}"
    if key not in _made:
        _made[key] = type(name, (_Stub,), {"_qualname": key})
    return _made[key]


class _MjrlUnpickler(pickle.Unpickler):
    """Unpickles mjrl policy pickles without mjrl installed: mjrl classes
    become attribute-bag stubs; the removed torch-1.x thnn backend hook is
    stubbed; torch tensors load normally (torch cpu is available)."""

    def find_class(self, module, name):
        if module.startswith("mjrl"):
            return _make_stub(module, name)
        if module == "torch.nn.backends.thnn":
            return lambda: None
        return super().find_class(module, name)


def _state(obj) -> Dict[str, Any]:
    return obj.__dict__.get("_state", obj.__dict__)


def load_dapg_params(path: str) -> Dict[str, np.ndarray]:
    """-> dict with 'layers' [(w, b), ...], 'log_std', 'in_shift',
    'in_scale', 'out_shift', 'out_scale', 'obs_dim', 'act_dim'."""
    with open(path, "rb") as f:
        mlp = _MjrlUnpickler(f).load()
    st = _state(mlp)
    net = _state(st["model"])

    fc = net["_modules"]["fc_layers"]._modules
    layers = []
    for idx in sorted(fc.keys(), key=int):
        lin = fc[idx]
        w = lin._parameters["weight"].detach().numpy()
        b = lin._parameters["bias"].detach().numpy()
        layers.append((np.asarray(w, np.float64), np.asarray(b, np.float64)))

    def t2np(x):
        import torch
        if isinstance(x, torch.Tensor):
            return np.asarray(x.detach().numpy(), np.float64)
        return np.asarray(x, np.float64)

    # mjrl pickles store the nonlinearity as the torch FUNCTION object
    # (e.g. <built-in method tanh>), not a string — normalize by name.
    nonlin = net.get("nonlinearity", "tanh")
    nonlin = getattr(nonlin, "__name__", str(nonlin)).lower()
    if "tanh" in nonlin:
        nonlin = "tanh"
    elif "relu" in nonlin:
        nonlin = "relu"
    else:
        raise ValueError(f"unknown mjrl nonlinearity {nonlin!r}")
    return {
        "layers": layers,
        "log_std": t2np(st["log_std"]),
        "in_shift": t2np(net["in_shift"]),
        "in_scale": t2np(net["in_scale"]),
        "out_shift": t2np(net["out_shift"]),
        "out_scale": t2np(net["out_scale"]),
        "obs_dim": int(net["obs_dim"]),
        "act_dim": int(net["act_dim"]),
        "nonlinearity": nonlin,
    }


def make_policy(params: Dict[str, Any],
                dtype=jnp.float32) -> Callable[[jnp.ndarray], jnp.ndarray]:
    """Pure-JAX deterministic action (the reference's evaluation path,
    `baselines.py:82-86`: act = mean)."""
    ws = [(jnp.asarray(w, dtype), jnp.asarray(b, dtype))
          for w, b in params["layers"]]
    in_shift = jnp.asarray(params["in_shift"], dtype)
    in_scale = jnp.asarray(params["in_scale"], dtype)
    out_shift = jnp.asarray(params["out_shift"], dtype)
    out_scale = jnp.asarray(params["out_scale"], dtype)
    nonlin = jnp.tanh if params["nonlinearity"] == "tanh" else jax.nn.relu

    def act(obs: jnp.ndarray) -> jnp.ndarray:
        x = (obs - in_shift) / (in_scale + 1e-8)
        for w, b in ws[:-1]:
            x = nonlin(x @ w.T + b)
        w, b = ws[-1]
        x = x @ w.T + b
        return x * out_scale + out_shift

    return act


def load_policy(task: str, dtype=jnp.float32,
                root: str = "/root/reference/mj_envs_vision/algos/"
                            "dapg_pretrained") -> Tuple[Callable, Dict]:
    params = load_dapg_params(f"{root}/{task}-v0.pickle")
    return make_policy(params, dtype), params
