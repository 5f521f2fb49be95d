"""Scene pluggability: the SH scene trains end-to-end through the
unchanged Trainer (contract models/scene.py)."""

import os

import numpy as np
import pytest

from splat_trainer_tpu.controller import TargetConfig
from splat_trainer_tpu.config import Constant
from splat_trainer_tpu.data.synthetic import SyntheticDataset
from splat_trainer_tpu.logger import NullLogger
from splat_trainer_tpu.models.sh_scene import SHSceneConfig
from splat_trainer_tpu.trainer.config import TrainConfig
from splat_trainer_tpu.trainer.init import CloudInitConfig
from splat_trainer_tpu.trainer.trainer import Trainer
from splat_trainer_tpu.trainer.view_selection import RandomSamplerConfig


def test_sh_scene_trains_and_densifies(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    os.environ["TQDM_DISABLE"] = "1"
    dataset = SyntheticDataset(num_images=8, image_size=(48, 48),
                               num_points=200)
    config = TrainConfig(
        scene=SHSceneConfig(sh_degree=2),
        controller=TargetConfig(densify_prune_interval=Constant(20),
                                min_views=1),
        view_selection=RandomSamplerConfig(batch_size=1),
        cloud_init=CloudInitConfig(initial_points=256, limit_points=128,
                                   num_neighbors=3, min_view_overlap=2,
                                   clamp_near=0.1),
        total_steps=60, eval_steps=30, log_interval=10,
        target_points=512, raster_backend="dense",
        max_instances=1 << 14, chunk_size=16,
        save_output=True, log_images=False, max_ssim_regression=1.0)

    trainer = Trainer.initialize(config, dataset, NullLogger())
    metrics = trainer.train()
    psnrs = [e["train_psnr"] for e in trainer.evaluation_log]
    assert psnrs[-1] > psnrs[0], psnrs
    assert np.isfinite(metrics["train_psnr"])

    # direct SH export (no distillation needed for this scene)
    g = trainer.sh_gaussians()
    n = int(np.asarray(trainer.scene.active).sum())
    assert g.feature.shape == (n, 3, 9)

    # checkpoint round-trips through the same generic state tree
    from splat_trainer_tpu.trainer import checkpoint as ckpt
    state = ckpt.load_checkpoint(
        trainer.paths().checkpoint, trainer.scene, trainer.pstate)
    assert int(np.asarray(state["scene"].active).sum()) == n
    trainer.close()
