"""Gaussian split/clone/sample math, static-capacity slot edition.

Capability equivalent of /root/reference/splat_trainer/gaussians/split.py
(point_basis, split_gaussians_uniform, sample_gaussians, clone_points) and
the capacity-slot machinery that replaces the reference's tensor
reallocation (mlp_scene.py:301-313) under XLA static shapes
(SURVEY.md §7.1 decision 2, §7.4 hard part #3).

Slot allocation: prune clears `active` slots; each split parent writes k=2
children into free slots found by ranking the free list — a pure
sort/cumsum computation, deterministic and shard-friendly.
"""

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from splat_trainer_tpu.utils import transforms


def point_basis(log_scaling: jax.Array, rotation: jax.Array,
                eps: float = 1e-4) -> jax.Array:
    """B = R diag(max(exp(log_s), eps)): local gaussian frame -> world."""
    scale = jnp.maximum(jnp.exp(log_scaling), eps)
    r = transforms.quat_to_rotmat(transforms.normalize(rotation))
    return r * scale[:, None, :]


def sample_gaussians(points: Dict[str, jax.Array], local_samples: jax.Array) -> jax.Array:
    """Local unit-gaussian samples (N, 3) -> world-space offsets (N, 3)."""
    basis = point_basis(points["log_scaling"], points["rotation"])
    return jnp.einsum("nij,nj->ni", basis, local_samples)


def split_axes(log_scaling: jax.Array, key: jax.Array | None = None) -> jax.Array:
    """Choose a split axis per point: multinomial over scales if key given
    (random_axis=True), else argmax (split.py:92-100). Returns one-hot (N, 3)."""
    if key is not None:
        probs = jnp.maximum(jnp.exp(log_scaling), 1e-4)
        probs = probs / probs.sum(axis=-1, keepdims=True)
        axis = jax.random.categorical(key, jnp.log(probs), axis=-1)
    else:
        axis = jnp.argmax(log_scaling, axis=-1)
    return jax.nn.one_hot(axis, 3, dtype=log_scaling.dtype)


def split_children(points: Dict[str, jax.Array], key: jax.Array | None,
                   sep: float = 0.7, k: int = 2) -> Dict[str, jax.Array]:
    """Uniform axis split: k children at +-sep sigma along the chosen axis,
    scale shrunk by 1/sqrt(k) along that axis (split.py:87-113).

    Returns a dict of child params with leading axis (N, k, ...).
    """
    axis = split_axes(points["log_scaling"], key)           # (N, 3)
    offsets_local = jnp.linspace(-sep, sep, k)[None, :, None] * axis[:, None, :]
    basis = point_basis(points["log_scaling"], points["rotation"])
    offsets = jnp.einsum("nij,nkj->nki", basis, offsets_local)   # (N, k, 3)

    out = {}
    for name, v in points.items():
        child = jnp.repeat(v[:, None], k, axis=1)
        if name == "position":
            child = child + offsets
        elif name == "log_scaling":
            child = child + jnp.log(1.0 / jnp.sqrt(float(k))) * axis[:, None, :]
        out[name] = child
    return out


def free_slot_targets(active: jax.Array, source_mask: jax.Array, k: int = 2):
    """Deterministic slot allocation for split children.

    For each point where `source_mask` (sorted by slot index), children
    j = 0..k-1 go to the (k*rank + j)-th free slot (~active, by slot index).

    Returns:
        child_slots: (N, k) int32 target slot per child (clipped; may exceed
            free capacity — callers mask with `ok`).
        ok: (N, k) bool — allocation succeeded (enough free slots).
    """
    n = active.shape[0]
    free = ~active
    free_idx = jnp.argsort(~free, stable=True)          # free slots first, by index
    num_free = free.sum()

    # scan operand materialized first: the axon TPU backend miscompiles
    # prefix scans over fused producer graphs (see ops/tiling._scan_guard)
    (source_mask,) = jax.lax.optimization_barrier((source_mask,))
    rank = jnp.cumsum(source_mask) - 1                  # rank among split parents
    child_rank = rank[:, None] * k + jnp.arange(k)[None, :]
    ok = source_mask[:, None] & (child_rank < num_free)
    child_slots = free_idx[jnp.clip(child_rank, 0, n - 1)]
    return child_slots.astype(jnp.int32), ok


def apply_split_prune(
    points: Dict[str, jax.Array],
    active: jax.Array,
    split_mask: jax.Array,
    prune_mask: jax.Array,
    key: jax.Array | None,
    k: int = 2,
) -> Tuple[Dict[str, jax.Array], jax.Array, jax.Array, jax.Array]:
    """Capacity-slot densification step.

    - prune_mask slots are deactivated,
    - split_mask parents are deactivated and replaced by k children written
      into free slots (children that don't fit are dropped, counted).

    Returns (new_points, new_active, touched_mask, dropped_children) where
    `touched_mask` marks slots whose content changed (fresh points — callers
    reset optimizer moments / controller stats there).
    """
    split_mask = split_mask & active & ~prune_mask
    prune_mask = prune_mask & active

    # slots free for children = everything not staying active
    staying = active & ~(split_mask | prune_mask)
    child_slots, ok = free_slot_targets(staying, split_mask, k)

    children = split_children(points, key, k=k)

    n = active.shape[0]
    flat_ok = ok.reshape(-1)
    # children that don't fit scatter to index n, dropped by mode="drop"
    flat_slots = jnp.where(flat_ok, child_slots.reshape(-1), n)

    new_points = {}
    for name, v in points.items():
        child_vals = children[name].reshape((-1,) + v.shape[1:])
        new_points[name] = v.at[flat_slots].set(child_vals, mode="drop")

    touched = jnp.zeros_like(active).at[flat_slots].set(True, mode="drop")
    new_active = staying | touched
    dropped = (split_mask.sum() * k - flat_ok.sum()).astype(jnp.int32)
    return new_points, new_active, touched, dropped
