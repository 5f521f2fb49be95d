"""Optimizer/pytree introspection and A/B comparison utilities.

Capability equivalent of /root/reference/splat_trainer/debug/optim.py:14-136
(compare_optimizers / compare_tensors with rtol/atol reporting, tensordict
stats tables) — built for A/B-ing optimizer implementations.
"""

from typing import Any, Dict

import jax
import numpy as np


def tree_stats(tree: Any) -> "object":
    """Per-leaf statistics table (pandas DataFrame)."""
    import pandas as pd

    rows = []
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        x = np.asarray(leaf)
        if not np.issubdtype(x.dtype, np.number):
            continue
        rows.append(dict(
            name=jax.tree_util.keystr(path),
            shape=str(x.shape), dtype=str(x.dtype),
            mean=float(x.mean()) if x.size else 0.0,
            std=float(x.std()) if x.size else 0.0,
            min=float(x.min()) if x.size else 0.0,
            max=float(x.max()) if x.size else 0.0,
            nonfinite=int((~np.isfinite(x.astype(np.float64))).sum())
            if np.issubdtype(x.dtype, np.floating) else 0,
        ))
    return pd.DataFrame(rows)


def compare_trees(a: Any, b: Any, rtol: float = 1e-5, atol: float = 1e-6
                  ) -> Dict[str, dict]:
    """Leaf-by-leaf comparison report (reference compare_tensors,
    debug/optim.py:74-102). Returns {path: {max_abs, max_rel, mismatched}}
    for leaves that differ beyond tolerance."""
    report = {}
    la = jax.tree_util.tree_flatten_with_path(a)[0]
    lb = jax.tree_util.tree_leaves(b)
    assert len(la) == len(lb), "trees have different structure"
    for (path, xa), xb in zip(la, lb):
        xa, xb = np.asarray(xa, np.float64), np.asarray(xb, np.float64)
        if xa.shape != xb.shape:
            report[jax.tree_util.keystr(path)] = {"shape": (xa.shape, xb.shape)}
            continue
        diff = np.abs(xa - xb)
        bad = diff > (atol + rtol * np.abs(xb))
        if bad.any():
            rel = diff / np.maximum(np.abs(xb), 1e-12)
            report[jax.tree_util.keystr(path)] = dict(
                max_abs=float(diff.max()), max_rel=float(rel.max()),
                mismatched=int(bad.sum()), total=int(bad.size))
    return report


def count_nonfinite(tree: Any) -> Dict[str, int]:
    """Non-finite entry counts per leaf (taichi torch_lib.util equivalent,
    SURVEY.md N9)."""
    out = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        x = np.asarray(leaf)
        if np.issubdtype(x.dtype, np.floating):
            n = int((~np.isfinite(x)).sum())
            if n:
                out[jax.tree_util.keystr(path)] = n
    return out
