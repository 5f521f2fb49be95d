"""Golden quality-regression guard (VERDICT r1 item 6).

Pins the PSNR trajectory of a small deterministic training run so kernel /
binning / reduction optimizations cannot silently cost quality. The scene
is the synthetic dataset (deterministic), dense backend off — this runs
the PALLAS path in interpret mode, i.e. the exact code the TPU executes —
with the Target controller (densify + prune + the new opacity reset all
exercised).

If the recipe legitimately changes, regenerate with:
    GOLDEN_REGEN=1 python -m pytest tests/test_golden_quality.py -s
and commit the printed table.

Marked slow: ~3-4 min on CPU.
"""

import os

import numpy as np
import pytest

from splat_trainer_tpu.controller import TargetConfig
from splat_trainer_tpu.data.synthetic import SyntheticDataset
from splat_trainer_tpu.logger import NullLogger
from splat_trainer_tpu.models.mlp_scene import MLPSceneConfig
from splat_trainer_tpu.trainer.config import TrainConfig
from splat_trainer_tpu.trainer.init import CloudInitConfig
from splat_trainer_tpu.trainer.trainer import Trainer
from splat_trainer_tpu.trainer.view_selection import RandomSamplerConfig

# regenerate with GOLDEN_REGEN=1 (see module docstring).
# The bf16 arm (the TPU default stack: bf16-packed sort payloads,
# saturation compaction, bwd_moments, tiles_per_block) runs a LONGER
# 500-step trajectory so densification pressure + opacity resets act
# before the final pin (VERDICT r2 weak #8); the f32 arm keeps the
# 200-step precision gate.
# NOTE the two arms run different total_steps, so their Varying schedules
# (t = step/total) and hence their pins differ — each arm gates its own
# path; the direct bf16-vs-f32 comparison at matched recipe lives in
# tests/test_rasterize_pallas.py::test_grad_bf16_pack_parity.
#
# Pin-movement attribution (VERDICT r4 weak #7): re-pinning the bf16 arm
# with scan contractions enabled moved step-500 from 22.75 to 22.07
# (-0.68 dB), far above the garden-scale A/B's -0.04 dB. Measured
# 2026-08-21: the identical recipe with f32 scans (only that knob
# flipped) lands at 22.46, and the per-step deltas vs the bf16 pin are
# MIXED-SIGN (bf16 higher at step 200: 21.73 vs 21.62; lower at 300:
# 21.76 vs 22.15, and 500: 22.07 vs 22.46) — at 431-512 points a single
# densify/opacity-reset decision forks the trajectory, so the step-500
# gap is toy-scale run divergence, not a systematic precision penalty;
# the controlled measurement is the garden A/B (runs/ab_scan_bf16,
# -0.04 dB over 2000 steps at 600k points).
GOLDEN_VAL_PSNR = {
    True: {100: 16.75, 200: 21.73, 300: 21.76, 400: 21.83, 500: 22.07},
    False: {100: 18.17, 200: 22.35},
}
TOLERANCE_DB = 0.4


@pytest.mark.slow
@pytest.mark.parametrize("grad_bf16_pack", [True, False],
                         ids=["bf16-grads", "f32-grads"])
def test_golden_psnr_trajectory(tmp_path, monkeypatch, grad_bf16_pack):
    """Both gradient-reduction precisions must hold the pinned trajectory:
    the bf16 sort-payload packing (the TPU default) is quality-gated by
    the same ±TOLERANCE_DB band as the f32 path it replaces."""
    monkeypatch.chdir(tmp_path)
    os.environ["TQDM_DISABLE"] = "1"
    total_steps = 500 if grad_bf16_pack else 200

    dataset = SyntheticDataset(num_images=8, image_size=(48, 48),
                               num_points=200)
    config = TrainConfig(
        scene=MLPSceneConfig(point_features=8, image_features=8),
        controller=TargetConfig(
            min_views=1, opacity_reset_interval=60,
            opacity_reset_stop_t=0.6),
        view_selection=RandomSamplerConfig(batch_size=1),
        cloud_init=CloudInitConfig(initial_points=256, limit_points=128,
                                   num_neighbors=3, min_view_overlap=2,
                                   clamp_near=0.1),
        total_steps=total_steps,
        eval_steps=100,
        log_interval=20,
        target_points=512,
        raster_backend="pallas",   # interpret mode on CPU — the TPU path
        grad_bf16_pack=grad_bf16_pack,
        # the bf16 arm runs the full TPU default precision stack (which
        # since the garden quality A/B includes bf16 scan contractions);
        # the f32 arm pins the all-f32 precision path explicitly
        bwd_scan_bf16=grad_bf16_pack,
        fwd_scan_bf16=grad_bf16_pack,
        max_instances=1 << 14,
        chunk_size=16,
        save_output=False,
        log_images=False,
        max_ssim_regression=1.0,
        seed=0,
    )
    trainer = Trainer.initialize(config, dataset, NullLogger())
    trainer.train()

    got = {}
    for entry in trainer.evaluation_log:
        if "val_psnr" in entry:
            got[entry["step"]] = float(entry["val_psnr"])

    if os.environ.get("GOLDEN_REGEN"):
        print("\nGOLDEN_VAL_PSNR = {")
        for step, v in sorted(got.items()):
            print(f"    {step}: {v:.2f},")
        print("}")
        return

    for step, want in GOLDEN_VAL_PSNR[grad_bf16_pack].items():
        assert step in got, f"missing eval at step {step}: {got}"
        assert abs(got[step] - want) <= TOLERANCE_DB, (
            f"val PSNR at step {step} drifted: got {got[step]:.2f}, "
            f"golden {want:.2f} (±{TOLERANCE_DB})")
