"""Checkpoint save/load: pytrees via flax msgpack + host state via npz/json.

Capability equivalent of the reference's torch.save state_dict tree
(trainer.py:188-256, scripts/checkpoint.py:23-140): the same nested
component tree, serialized portably (no pickle).
"""

import json
import os
from pathlib import Path

import jax
import numpy as np
from flax import serialization

from splat_trainer_tpu.controller.point_state import PointState


def _to_host(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def save_checkpoint(path, state: dict):
    path = Path(path)
    path.mkdir(parents=True, exist_ok=True)

    with open(path / "scene.msgpack", "wb") as f:
        f.write(serialization.to_bytes(_to_host(state["scene"])))
    with open(path / "pstate.msgpack", "wb") as f:
        f.write(serialization.to_bytes(_to_host(state["pstate"])))

    host = state["host"]
    arrays = {}

    def jsonify(obj, prefix):
        if isinstance(obj, dict):
            return {k: jsonify(v, f"{prefix}/{k}") for k, v in obj.items()}
        if isinstance(obj, np.ndarray):
            arrays[prefix] = obj
            return {"__npz__": prefix}
        if isinstance(obj, (np.integer,)):
            return int(obj)
        if isinstance(obj, (np.floating,)):
            return float(obj)
        if isinstance(obj, (list, tuple)):
            return [jsonify(v, f"{prefix}/{i}") for i, v in enumerate(obj)]
        return obj

    host_json = jsonify(host, "host")
    if arrays:
        np.savez_compressed(path / "host_arrays.npz", **arrays)
    with open(path / "host.json", "w") as f:
        json.dump(host_json, f)


def load_checkpoint(path, scene_template, pstate_template: PointState) -> dict:
    """Load into templates (built by Trainer.initialize-like construction
    with matching shapes)."""
    path = Path(path)
    with open(path / "scene.msgpack", "rb") as f:
        scene = serialization.from_bytes(scene_template, f.read())
    with open(path / "pstate.msgpack", "rb") as f:
        pstate = serialization.from_bytes(pstate_template, f.read())

    arrays = {}
    npz = path / "host_arrays.npz"
    if npz.exists():
        arrays = dict(np.load(npz, allow_pickle=False))

    def unjsonify(obj):
        if isinstance(obj, dict):
            if "__npz__" in obj:
                return arrays[obj["__npz__"]]
            return {k: unjsonify(v) for k, v in obj.items()}
        if isinstance(obj, list):
            return [unjsonify(v) for v in obj]
        return obj

    with open(path / "host.json") as f:
        host = unjsonify(json.load(f))
    return dict(scene=scene, pstate=pstate, host=host)


def find_latest_checkpoint(workspace) -> Path:
    """Find checkpoint_<step> with the largest step
    (reference scripts/checkpoint.py:23-37)."""
    root = Path(workspace) / "checkpoint"
    cands = [p for p in root.glob("checkpoint_*") if p.is_dir()]
    if not cands:
        raise FileNotFoundError(f"no checkpoints under {root}")
    return max(cands, key=lambda p: int(p.name.split("_")[-1]))
