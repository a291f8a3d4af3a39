"""Exec-free extraction of reference PyTorch checkpoints.

The reference persists networks with ``@persistent_class`` pickles that embed
their own source code and re-execute it at load time
(reference: thirdparty/.../torch_utils/persistence.py:35-251).  Running
untrusted embedded source is neither necessary nor desirable: all we need are
the tensors and constructor kwargs.  This module installs a custom Unpickler
that replaces ``_reconstruct_persistent_obj`` with a passive record holding
the pickled state, then walks torch Module state dicts
(``_parameters`` / ``_buffers`` / ``_modules``) into a flat
``name -> numpy array`` map -- no reference code is imported or executed.
"""

from __future__ import annotations

import io
import pickle
from typing import Any, Dict

import numpy as np


class EasyDict(dict):
    """Attribute-access dict standing in for dnnlib.EasyDict during unpickling."""

    def __getattr__(self, name):
        try:
            return self[name]
        except KeyError:
            raise AttributeError(name)

    def __setattr__(self, name, value):
        self[name] = value


class PersistentStub:
    """Inert stand-in for a persistence-pickled torch module."""

    def __init__(self, meta=None):
        self.meta = meta

    def __setstate__(self, state):
        self.meta = state

    @property
    def state(self):
        if isinstance(self.meta, dict) and "state" in self.meta:
            return self.meta["state"]
        return self.meta


def _reconstruct_persistent_obj(meta):
    return PersistentStub(meta)


class _ReferenceUnpickler(pickle.Unpickler):
    def find_class(self, module, name):
        if name == "_reconstruct_persistent_obj":
            return _reconstruct_persistent_obj
        if name == "EasyDict":
            return EasyDict
        if module.startswith("torch"):
            import importlib
            return getattr(importlib.import_module(module), name)
        if module.startswith(("numpy", "collections", "builtins")):
            import importlib
            return getattr(importlib.import_module(module), name)
        # Any other foreign class (e.g. argparse.Namespace) -> passive stub.
        if module == "argparse" and name == "Namespace":
            import argparse
            return argparse.Namespace
        return PersistentStub


def load_reference_pickle(path: str) -> Any:
    with open(path, "rb") as f:
        return _ReferenceUnpickler(f).load()


def load_torch_file(path: str) -> Any:
    """torch.load for plain .pt checkpoints (encoder checkpoints)."""
    import torch
    return torch.load(path, map_location="cpu", weights_only=False)


def to_numpy(x) -> np.ndarray:
    try:
        import torch
        if isinstance(x, torch.Tensor):
            return x.detach().cpu().numpy()
    except ImportError:
        pass
    return np.asarray(x)


def flatten_module_state(obj, prefix: str = "") -> Dict[str, np.ndarray]:
    """Walk a (stubbed) torch Module state into flat name -> numpy arrays.

    Handles the nn.Module __dict__ layout: ``_parameters``, ``_buffers``,
    ``_modules`` (recursive), and our PersistentStub wrappers.
    """
    out: Dict[str, np.ndarray] = {}

    if isinstance(obj, PersistentStub):
        state = obj.state
        if isinstance(state, dict):
            return flatten_module_state(state, prefix)
        return out

    try:
        import torch
        if isinstance(obj, torch.nn.Module):
            for name, t in obj.state_dict().items():
                out[prefix + name] = to_numpy(t)
            return out
    except ImportError:
        pass

    if isinstance(obj, dict):
        for key in ("_parameters", "_buffers"):
            for name, t in (obj.get(key) or {}).items():
                if t is not None:
                    out[prefix + name] = to_numpy(t)
        for name, sub in (obj.get("_modules") or {}).items():
            if sub is not None:
                out.update(flatten_module_state(sub, prefix + name + "."))
        # Plain state dicts (name -> tensor).
        if "_modules" not in obj and "_parameters" not in obj:
            for name, t in obj.items():
                if _is_tensorlike(t):
                    out[prefix + name] = to_numpy(t)
                elif isinstance(t, (dict, PersistentStub)):
                    out.update(flatten_module_state(t, prefix + name + "."))
    return out


def module_attrs(obj) -> Dict[str, Any]:
    """Non-tensor attributes of a stubbed module (init args like z_dim)."""
    if isinstance(obj, PersistentStub):
        state = obj.state
        return state if isinstance(state, dict) else {}
    return obj if isinstance(obj, dict) else {}


def _is_tensorlike(t) -> bool:
    if isinstance(t, np.ndarray):
        return True
    try:
        import torch
        return isinstance(t, torch.Tensor)
    except ImportError:
        return False
