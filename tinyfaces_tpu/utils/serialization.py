"""Flat .npz (de)serialization of nested param pytrees.

A light-weight, dependency-free interchange format: keys are '/'-joined
paths like 'params/backbone/conv1/kernel'. Used for torch-checkpoint
conversion output and simple weight exports.
"""

from __future__ import annotations

from typing import Any, Mapping

import numpy as np


def flatten_tree(tree: Mapping[str, Any], prefix: str = "") -> dict[str, np.ndarray]:
    out: dict[str, np.ndarray] = {}
    for k, v in tree.items():
        path = f"{prefix}/{k}" if prefix else str(k)
        if isinstance(v, Mapping):
            out.update(flatten_tree(v, path))
        else:
            out[path] = np.asarray(v)
    return out


def unflatten_tree(flat: Mapping[str, np.ndarray]) -> dict:
    root: dict = {}
    for path, value in flat.items():
        parts = path.split("/")
        node = root
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = np.asarray(value)
    return root


def save_npz(path, tree: Mapping[str, Any]) -> None:
    np.savez(path, **flatten_tree(tree))


def unflatten_npz(npz) -> dict:
    return unflatten_tree({k: npz[k] for k in npz.files})
