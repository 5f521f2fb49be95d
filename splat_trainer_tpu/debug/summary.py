"""Whole-dataset backward-pass statistics dump.

Capability equivalent of /root/reference/splat_trainer/trainer/debug.py:30
(`batch_summary`): run render + backward over every training view and
tabulate per-view loss metrics, visible counts, and per-parameter gradient
norms — the tool for diagnosing which views/parameters drive a divergence.
"""

import functools
from typing import Optional

import numpy as np


def batch_summary(trainer, limit: Optional[int] = None):
    """Per-view backward statistics over the training set.

    Returns a pandas DataFrame with one row per view: psnr/l1/ssim,
    num_visible, clipped instances, and the L2 norm of each point-parameter
    gradient family. Heavy: one full backward per view.
    """
    import jax
    import pandas as pd

    from splat_trainer_tpu.trainer.train_step import batch_gradients, make_hyper

    grad_fn = jax.jit(functools.partial(
        batch_gradients,
        scene_config=trainer.config.scene,
        raster_config=trainer.config.raster_config(),
        image_size=trainer.camera_table.image_size,
        ssim_levels=trainer.config.ssim_levels))
    hyper = make_hyper(trainer.config.scene, trainer.config,
                       trainer.progress.t)

    rows = []
    views = trainer.dataset.train(shuffle=False)
    if limit is not None:
        views = views[:limit]
    for view in views:
        bundle = grad_fn(trainer.scene, trainer.make_batch([view]), hyper)
        m = bundle.metrics
        row = dict(
            view=view.filename,
            psnr=float(m["psnr"]), l1=float(m["l1"]), ssim=float(m["ssim"]),
            num_visible=int(m["num_visible"]),
            clipped=int(m["clipped"]),
            split_score_sum=float(np.asarray(bundle.heur[:, 0]).sum()),
            prune_cost_sum=float(np.asarray(bundle.heur[:, 1]).sum()),
        )
        for name, g in bundle.grads.points.items():
            row[f"grad_{name}"] = float(np.linalg.norm(np.asarray(g)))
        rows.append(row)
    return pd.DataFrame(rows)
