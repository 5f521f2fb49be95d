"""Milestone-4 experiment: camera pose refinement + bilateral color correction.

BASELINE.md config 4 (T&T truck: pose refinement + color corrector enabled)
on the procedural stand-in dataset: camera-table poses are perturbed by a
known noise while images stay rendered from TRUE poses, and per-image
exposure/white-balance jitter is applied — then two arms train the same
scene:

  frozen   — lr_pose = 0, no corrector (the reference's dormant scaffolding,
             camera_table/pose_table.py:70-80)
  refined  — lr_pose > 0 (per-image quaternion+translation deltas through
             the autodiff projection) + the bilateral-grid corrector in the
             loss (SURVEY.md #32, wired here unlike the reference)

Reported per arm: val PSNR/SSIM and mean camera rotation (deg) / center
(world units) error vs the TRUE poses — before and after refinement.

Usage: python scripts_dev/m4_pose_bilateral.py [--steps 4000] [--out runs]
"""

import argparse
import json
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import numpy as np


def pose_errors(table_poses: np.ndarray, true_poses: np.ndarray,
                scene=None) -> dict:
    """Mean rotation (deg) + camera-center (world) error of the effective
    poses (delta @ table) against the true poses."""
    import jax.numpy as jnp

    from splat_trainer_tpu.utils import transforms

    errs_r, errs_c = [], []
    for i in range(table_poses.shape[0]):
        Ti = table_poses[i].copy()
        if scene is not None:
            dq = np.asarray(transforms.normalize(jnp.asarray(scene.pose_dq[i])))
            D = np.eye(4, dtype=np.float64)
            D[:3, :3] = np.asarray(
                transforms.quat_to_rotmat(jnp.asarray(dq)), np.float64)
            D[:3, 3] = np.asarray(scene.pose_dt[i], np.float64)
            Ti = D @ Ti
        E = Ti[:3, :3] @ true_poses[i][:3, :3].T
        ang = np.degrees(np.arccos(np.clip((np.trace(E) - 1) / 2, -1.0, 1.0)))
        c_est = -Ti[:3, :3].T @ Ti[:3, 3]
        c_true = -true_poses[i][:3, :3].T @ true_poses[i][:3, 3]
        errs_r.append(ang)
        errs_c.append(np.linalg.norm(c_est - c_true))
    return {"rot_deg": float(np.mean(errs_r)),
            "center": float(np.mean(errs_c))}


def run_arm(name: str, *, steps: int, out: Path, lr_pose: float,
            bilateral: bool, pose_noise: float, jitter: float,
            num_images: int = 64, image_size=(768, 512),
            points: int = 100_000) -> dict:
    import jax

    from splat_trainer_tpu.color_corrector import (
        BilateralCorrectorConfig, NilCorrectorConfig,
    )
    from splat_trainer_tpu.controller import DisabledConfig
    from splat_trainer_tpu.data.procedural import ProceduralDataset
    from splat_trainer_tpu.logger.tensorboard import TensorboardLogger
    from splat_trainer_tpu.models.mlp_scene import MLPSceneConfig
    from splat_trainer_tpu.trainer.config import TrainConfig
    from splat_trainer_tpu.trainer.init import CloudInitConfig
    from splat_trainer_tpu.trainer.trainer import Trainer
    from splat_trainer_tpu.trainer.view_selection import RandomSamplerConfig

    dataset = ProceduralDataset(
        num_images=num_images, image_size=image_size, split_every=8,
        appearance_jitter=jitter, pose_noise=pose_noise, verbose=False)

    config = TrainConfig(
        total_steps=steps, eval_steps=max(steps // 4, 1), log_interval=20,
        target_points=points,
        controller=DisabledConfig(),
        scene=MLPSceneConfig(lr_pose=lr_pose),
        view_selection=RandomSamplerConfig(batch_size=1),
        cloud_init=CloudInitConfig(initial_points=points,
                                   limit_points=points // 2),
        color_corrector=(BilateralCorrectorConfig() if bilateral
                         else NilCorrectorConfig()),
        max_instances=1 << 21, chunk_size=128,
        max_ssim_regression=1.0, save_checkpoints=False, save_output=True,
        log_images=False)

    run_dir = out / f"m4_{name}"
    run_dir.mkdir(parents=True, exist_ok=True)
    cwd = os.getcwd()
    os.chdir(run_dir)
    try:
        trainer = Trainer.initialize(
            config, dataset, TensorboardLogger("tensorboard"))
        metrics = trainer.train()
        table = np.asarray(dataset.camera_table.cameras.camera_t_world,
                           np.float64)
        result = {
            "arm": name, "steps": steps,
            "val_psnr": metrics.get("val_psnr"),
            "val_ssim": metrics.get("val_ssim"),
            "val_cc_psnr": metrics.get("val_cc_psnr"),
            "pose_error_injected": pose_errors(
                table, dataset.true_poses.astype(np.float64)),
            "pose_error_refined": pose_errors(
                table, dataset.true_poses.astype(np.float64), trainer.scene),
        }
        trainer.close()
    finally:
        os.chdir(cwd)
    (run_dir / "result.json").write_text(json.dumps(result, indent=2))
    print(json.dumps(result, indent=2), flush=True)
    return result


def run_arm_v2(name: str, *, out: Path, pose_noise: float, jitter: float,
               coarse_steps: int = 2000, fine_steps: int = 3000,
               num_images: int = 64, image_size=(768, 512),
               points: int = 100_000) -> dict:
    """Two-stage pose recovery (VERDICT r1 item 4): the single-stage arm
    plateaus because the scene overfits the wrong poses before pose
    gradients bite. Counter-measures, per the round-1 verdict's
    prescription:

      stage 1 (coarse): 1/4-resolution images (wider pose basin, 16x
        cheaper steps), pose lr ramping 0 -> 1e-2 by t=0.3, geometry lrs
        damped 5x so poses move against a slowly-changing scene.
      stage 2 (fine): full resolution, scene + pose deltas carried over,
        pose lr decaying from 3e-3, normal geometry lrs.
    """
    import jax

    from splat_trainer_tpu.color_corrector import BilateralCorrectorConfig
    from splat_trainer_tpu.config import Between, LogDecay, SmoothStep
    from splat_trainer_tpu.controller import DisabledConfig
    from splat_trainer_tpu.data.procedural import ProceduralDataset
    from splat_trainer_tpu.logger.tensorboard import TensorboardLogger
    from splat_trainer_tpu.models.mlp_scene import (
        MLPSceneConfig, default_parameters,
    )
    from splat_trainer_tpu.trainer.config import TrainConfig
    from splat_trainer_tpu.trainer.init import CloudInitConfig
    from splat_trainer_tpu.trainer.trainer import Trainer
    from splat_trainer_tpu.trainer.view_selection import RandomSamplerConfig

    def damped_params(factor):
        params = default_parameters()
        for k in ("position", "log_scaling", "rotation"):
            params[k] = dict(params[k], lr=params[k]["lr"] * factor)
        return params

    common = dict(
        controller=DisabledConfig(),
        view_selection=RandomSamplerConfig(batch_size=1),
        cloud_init=CloudInitConfig(initial_points=points,
                                   limit_points=points // 2),
        color_corrector=BilateralCorrectorConfig(),
        target_points=points,
        max_instances=1 << 21, chunk_size=128,
        max_ssim_regression=1.0, save_checkpoints=False,
        log_images=False, log_interval=20)

    coarse_size = (image_size[0] // 4, image_size[1] // 4)
    ds_coarse = ProceduralDataset(
        num_images=num_images, image_size=coarse_size, split_every=8,
        appearance_jitter=jitter, pose_noise=pose_noise, verbose=False)
    # identical seed/num_images => identical injected pose perturbation and
    # camera geometry; only resolution differs
    ds_fine = ProceduralDataset(
        num_images=num_images, image_size=image_size, split_every=8,
        appearance_jitter=jitter, pose_noise=pose_noise, verbose=False)

    cfg1 = TrainConfig(
        total_steps=coarse_steps, eval_steps=coarse_steps,
        scene=MLPSceneConfig(
            lr_pose=Between(0.05, 0.3, SmoothStep(0.0, 1e-2)),
            parameters=damped_params(0.2)),
        save_output=False, **common)
    cfg2 = TrainConfig(
        total_steps=fine_steps, eval_steps=max(fine_steps // 3, 1),
        scene=MLPSceneConfig(lr_pose=LogDecay(3e-3, 0.1)),
        save_output=True, **common)

    run_dir = out / f"m4_{name}"
    run_dir.mkdir(parents=True, exist_ok=True)
    cwd = os.getcwd()
    os.chdir(run_dir)
    try:
        logger = TensorboardLogger("tensorboard")
        t1 = Trainer.initialize(cfg1, ds_coarse, logger)
        t1.train()
        mid = pose_errors(
            np.asarray(ds_coarse.camera_table.cameras.camera_t_world,
                       np.float64),
            ds_coarse.true_poses.astype(np.float64), t1.scene)
        print(f"# stage-1 pose error: {mid}", flush=True)

        # stage 2: fresh trainer at full res, scene (incl pose deltas and
        # corrector grids) carried over; optimizer moments reset
        t2 = Trainer.initialize(cfg2, ds_fine, logger)
        t2.scene = t1.scene
        t1.close()
        metrics = t2.train()
        table = np.asarray(ds_fine.camera_table.cameras.camera_t_world,
                           np.float64)
        result = {
            "arm": name, "steps": [coarse_steps, fine_steps],
            "val_psnr": metrics.get("val_psnr"),
            "val_ssim": metrics.get("val_ssim"),
            "val_cc_psnr": metrics.get("val_cc_psnr"),
            "pose_error_injected": pose_errors(
                table, ds_fine.true_poses.astype(np.float64)),
            "pose_error_stage1": mid,
            "pose_error_refined": pose_errors(
                table, ds_fine.true_poses.astype(np.float64), t2.scene),
        }
        t2.close()
    finally:
        os.chdir(cwd)
    (run_dir / "result.json").write_text(json.dumps(result, indent=2))
    print(json.dumps(result, indent=2), flush=True)
    return result


def run_arm_v3(name: str, *, out: Path, pose_noise: float, jitter: float,
               fine_steps: int = 1500, num_images: int = 24,
               image_size=(192, 128), points: int = 2000) -> dict:
    """EM-style alternation (v3). v2's joint coarse stage FAILED on this
    protocol (injected 3.83deg/0.20 -> 4.04deg/0.26 after stage 1): with
    free geometry the scene explains the misalignment away faster than
    poses correct, even at 1/4 resolution and damped lrs. v3 alternates:

      A  (consensus): frozen poses, normal lrs, coarse res — the scene
         converges to the blurry AVERAGE of the misaligned views, anchored
         near truth by the SfM cloud init (true geometry) and by the noise
         being zero-mean across cameras.
      B  (align): EVERYTHING frozen except per-image pose deltas — each
         camera independently aligns photometrically to the consensus,
         contracting toward the mean (≈ truth). lr sized so ~25 visits
         per camera cover the injected translation magnitude.
      A2/B2: one more contraction round at gentler lr.
      C  (fine joint): full res, poses + scene together, pose lr decaying.
    """
    import jax

    from splat_trainer_tpu.color_corrector import BilateralCorrectorConfig
    from splat_trainer_tpu.config import LogDecay
    from splat_trainer_tpu.controller import DisabledConfig
    from splat_trainer_tpu.data.procedural import ProceduralDataset
    from splat_trainer_tpu.logger.tensorboard import TensorboardLogger
    from splat_trainer_tpu.models.color_model import ColorModelConfig
    from splat_trainer_tpu.models.mlp_scene import (
        MLPSceneConfig, default_parameters,
    )
    from splat_trainer_tpu.trainer.config import TrainConfig
    from splat_trainer_tpu.trainer.init import CloudInitConfig
    from splat_trainer_tpu.trainer.trainer import Trainer
    from splat_trainer_tpu.trainer.view_selection import RandomSamplerConfig

    def scaled_params(factor):
        params = default_parameters()
        return {k: dict(v, lr=v["lr"] * factor) for k, v in params.items()}

    def scene_cfg(*, pose_lr, geom_factor=1.0, heads_frozen=False):
        cm = (ColorModelConfig(lr_diffuse=0.0, lr_specular=0.0)
              if heads_frozen else ColorModelConfig())
        return MLPSceneConfig(
            lr_pose=pose_lr,
            parameters=scaled_params(geom_factor),
            color_model=cm,
            lr_glo_feature=0.0 if heads_frozen else 2.0)

    common = dict(
        controller=DisabledConfig(),
        view_selection=RandomSamplerConfig(batch_size=1),
        cloud_init=CloudInitConfig(initial_points=points,
                                   limit_points=points // 2),
        color_corrector=BilateralCorrectorConfig(),
        target_points=points,
        max_instances=1 << 21, chunk_size=128,
        max_ssim_regression=1.0, save_checkpoints=False,
        log_images=False, log_interval=50)

    coarse_size = (image_size[0] // 2, image_size[1] // 2)
    ds_coarse = ProceduralDataset(
        num_images=num_images, image_size=coarse_size, split_every=8,
        appearance_jitter=jitter, pose_noise=pose_noise, verbose=False)
    ds_fine = ProceduralDataset(
        num_images=num_images, image_size=image_size, split_every=8,
        appearance_jitter=jitter, pose_noise=pose_noise, verbose=False)
    true_poses = ds_fine.true_poses.astype(np.float64)

    stages = [
        # (tag, dataset, steps, scene config)
        ("A_consensus", ds_coarse, 500, scene_cfg(pose_lr=0.0)),
        ("B_align", ds_coarse, 600,
         scene_cfg(pose_lr=2e-2, geom_factor=0.0, heads_frozen=True)),
        ("A2_consensus", ds_coarse, 300, scene_cfg(pose_lr=0.0)),
        ("B2_align", ds_coarse, 400,
         scene_cfg(pose_lr=5e-3, geom_factor=0.0, heads_frozen=True)),
        ("C_fine_joint", ds_fine, fine_steps,
         scene_cfg(pose_lr=LogDecay(1e-3, 0.1))),
    ]

    run_dir = out / f"m4_{name}"
    run_dir.mkdir(parents=True, exist_ok=True)
    cwd = os.getcwd()
    os.chdir(run_dir)
    stage_errors = {}
    try:
        logger = TensorboardLogger("tensorboard")
        scene = None
        metrics = {}
        for tag, ds, steps, scfg in stages:
            cfg = TrainConfig(
                total_steps=steps, eval_steps=steps, scene=scfg,
                save_output=(tag == "C_fine_joint"), **common)
            t = Trainer.initialize(cfg, ds, logger)
            if scene is not None:
                t.scene = scene
            metrics = t.train()
            scene = t.scene
            t.close()
            table = np.asarray(ds.camera_table.cameras.camera_t_world,
                               np.float64)
            stage_errors[tag] = pose_errors(table, true_poses, scene)
            print(f"# {tag}: pose error {stage_errors[tag]}", flush=True)
        table = np.asarray(ds_fine.camera_table.cameras.camera_t_world,
                           np.float64)
        result = {
            "arm": name,
            "steps": [s[2] for s in stages],
            "val_psnr": metrics.get("val_psnr"),
            "val_ssim": metrics.get("val_ssim"),
            "val_cc_psnr": metrics.get("val_cc_psnr"),
            "pose_error_injected": pose_errors(table, true_poses),
            "pose_error_stages": stage_errors,
            "pose_error_refined": pose_errors(table, true_poses, scene),
        }
    finally:
        os.chdir(cwd)
    (run_dir / "result.json").write_text(json.dumps(result, indent=2))
    print(json.dumps(result, indent=2), flush=True)
    return result


def align_all_cameras(trainer, ds, *, radius=10, min_ncc=0.45,
                      cells=(12, 16), huber_px=3.0):
    """One correspondence-based alignment round over every camera
    (cameras/align.py): render consensus + median depth from each camera's
    current effective pose, NCC-match keypoints into its observed image,
    Gauss-Newton-solve the 6-DoF pose, and write the new per-image delta
    into the scene (optimizer moments reset — the jump is discrete)."""
    import jax
    import jax.numpy as jnp

    from splat_trainer_tpu.cameras import align as A
    from splat_trainer_tpu.models import mlp_scene as ms
    from splat_trainer_tpu.optim.sparse_adam import row_adam_init
    from splat_trainer_tpu.utils import transforms as TR

    rcfg = trainer.config.raster_config(render_median_depth=True)
    scfg = trainer.config.scene
    lum = jnp.asarray([0.299, 0.587, 0.114])

    @jax.jit
    def render_gray(scene, T, proj, near, far, idx):
        cam0 = trainer.camera_params(0)
        cam = cam0.replace(T_camera_world=T, projection=proj,
                           near_plane=near, far_plane=far)
        r = ms.render(scene, scfg, cam, idx, rcfg)
        return r.image @ lum, r.median_depth_image

    far = float(trainer.camera_params(0).far_plane)

    @jax.jit
    def align_one(gray_r, depth, obs, proj, T_eff):
        return A.align_camera(gray_r, depth, obs, proj, T_eff,
                              cells=cells, radius=radius, min_ncc=min_ncc,
                              huber_px=huber_px, max_depth=0.9 * far)

    scene = trainer.scene
    n = ds.camera_table.num_images
    new_dq, new_dt, stats = [], [], []
    for i in range(n):
        cam = trainer.camera_params(i)
        gray_r, depth = render_gray(scene, cam.T_camera_world,
                                    cam.projection, cam.near_plane,
                                    cam.far_plane, jnp.int32(i))
        view = ds.loader([i])[0]
        obs = jnp.asarray(view.image, jnp.float32) @ lum / 255.0

        dq = np.asarray(TR.normalize(scene.pose_dq[i]), np.float64)
        D = np.eye(4)
        D[:3, :3] = np.asarray(TR.quat_to_rotmat(
            jnp.asarray(dq, jnp.float32)), np.float64)
        D[:3, 3] = np.asarray(scene.pose_dt[i], np.float64)
        T_tab = np.asarray(cam.T_camera_world, np.float64)
        T_eff = D @ T_tab

        res = align_one(gray_r, depth, obs, cam.projection,
                        jnp.asarray(T_eff, jnp.float32))
        # acceptance guard: a camera whose solve had too few confident
        # correspondences (blank consensus region, sky-dominated view)
        # keeps its existing delta — never replace a pose with a solve
        # the solver itself reports as unsupported
        if float(res.inlier_frac) < 0.25:
            new_dq.append(dq.astype(np.float32))
            new_dt.append(np.asarray(scene.pose_dt[i], np.float32))
            stats.append((float(res.rms_px), float(res.inlier_frac), 0))
            continue
        T_new = np.asarray(res.T_camera_world, np.float64)
        # new delta w.r.t. the dataset table pose: delta = T_new @ T_tab^-1
        Rt = T_tab[:3, :3]
        T_tab_inv = np.eye(4)
        T_tab_inv[:3, :3] = Rt.T
        T_tab_inv[:3, 3] = -Rt.T @ T_tab[:3, 3]
        Dn = T_new @ T_tab_inv
        q = np.asarray(TR.rotmat_to_quat(
            jnp.asarray(Dn[:3, :3], jnp.float32)))
        new_dq.append(q)
        new_dt.append(Dn[:3, 3].astype(np.float32))
        stats.append((float(res.rms_px), float(res.inlier_frac), 1))

    pose_dq = jnp.asarray(np.stack(new_dq))
    pose_dt = jnp.asarray(np.stack(new_dt))
    stacked = jnp.concatenate([pose_dq, pose_dt], axis=-1)
    trainer.scene = scene.replace(pose_dq=pose_dq, pose_dt=pose_dt,
                                  pose_opt=row_adam_init(stacked))
    rms = np.mean([s[0] for s in stats])
    inl = np.mean([s[1] for s in stats])
    acc = int(sum(s[2] for s in stats))
    print(f"# align round: mean rms {rms:.2f} px, mean inliers {inl:.2f}, "
          f"accepted {acc}/{len(stats)}", flush=True)
    return {"rms_px": float(rms), "inlier_frac": float(inl),
            "accepted": acc}


def run_arm_v4(name: str, *, out: Path, pose_noise: float, jitter: float,
               fine_steps: int = 3000, num_images: int = 64,
               image_size=(768, 512), points: int = 100_000) -> dict:
    """Correspondence-based recovery (v4 — the VERDICT r3 protocol change).

    v1-v3 all descended the photometric rendering loss and all diverged or
    stalled: at this texture density the photometric basin around a ~1deg
    pose error is narrower than any lr that moves poses usefully. v4 never
    descends that loss for poses. Instead (cameras/align.py): the consensus
    scene (trained briefly with poses FROZEN, geometry anchored by the true
    SfM cloud init) is rendered from each camera with median depth;
    keypoints are NCC-matched into the observed image (capture range =
    search radius, independent of any basin); each camera's 6-DoF pose is
    then SOLVED by Huber-robust Gauss-Newton PnP. Two consensus/align
    rounds, then a fine joint polish.
    """
    from splat_trainer_tpu.color_corrector import BilateralCorrectorConfig
    from splat_trainer_tpu.config import LogDecay
    from splat_trainer_tpu.controller import DisabledConfig
    from splat_trainer_tpu.data.procedural import ProceduralDataset
    from splat_trainer_tpu.logger.tensorboard import TensorboardLogger
    from splat_trainer_tpu.models.mlp_scene import MLPSceneConfig
    from splat_trainer_tpu.trainer.config import TrainConfig
    from splat_trainer_tpu.trainer.init import CloudInitConfig
    from splat_trainer_tpu.trainer.trainer import Trainer
    from splat_trainer_tpu.trainer.view_selection import RandomSamplerConfig

    common = dict(
        controller=DisabledConfig(),
        view_selection=RandomSamplerConfig(batch_size=1),
        cloud_init=CloudInitConfig(initial_points=points,
                                   limit_points=points // 2),
        color_corrector=BilateralCorrectorConfig(),
        target_points=points,
        max_instances=1 << 21, chunk_size=128,
        max_ssim_regression=1.0, save_checkpoints=False,
        log_images=False, log_interval=50)

    coarse_size = (image_size[0] // 2, image_size[1] // 2)
    ds_coarse = ProceduralDataset(
        num_images=num_images, image_size=coarse_size, split_every=8,
        appearance_jitter=jitter, pose_noise=pose_noise, verbose=False)
    ds_fine = ProceduralDataset(
        num_images=num_images, image_size=image_size, split_every=8,
        appearance_jitter=jitter, pose_noise=pose_noise, verbose=False)
    true_poses = ds_fine.true_poses.astype(np.float64)

    run_dir = out / f"m4_{name}"
    run_dir.mkdir(parents=True, exist_ok=True)
    cwd = os.getcwd()
    os.chdir(run_dir)
    stage_errors = {}
    try:
        logger = TensorboardLogger("tensorboard")

        def consensus(tag, steps, scene=None):
            cfg = TrainConfig(
                total_steps=steps, eval_steps=steps,
                scene=MLPSceneConfig(lr_pose=0.0),
                save_output=False, **common)
            t = Trainer.initialize(cfg, ds_coarse, logger)
            if scene is not None:
                t.scene = scene
            t.train()
            table = np.asarray(
                ds_coarse.camera_table.cameras.camera_t_world, np.float64)
            stage_errors[tag] = pose_errors(table, true_poses, t.scene)
            print(f"# {tag}: pose error {stage_errors[tag]}", flush=True)
            return t

        t = consensus("A_consensus", 800)
        for rnd in (1, 2):
            align_all_cameras(t, ds_coarse)
            table = np.asarray(
                ds_coarse.camera_table.cameras.camera_t_world, np.float64)
            stage_errors[f"align_{rnd}"] = pose_errors(
                table, true_poses, t.scene)
            print(f"# align_{rnd}: pose error {stage_errors[f'align_{rnd}']}",
                  flush=True)
            scene = t.scene
            t.close()
            t = consensus(f"A{rnd + 1}_consensus", 400, scene)

        # fine joint polish: full res, scene + small decaying pose lr
        cfg_fine = TrainConfig(
            total_steps=fine_steps, eval_steps=max(fine_steps // 3, 1),
            scene=MLPSceneConfig(lr_pose=LogDecay(5e-4, 0.1)),
            save_output=True, **common)
        t2 = Trainer.initialize(cfg_fine, ds_fine, logger)
        t2.scene = t.scene
        t.close()
        metrics = t2.train()
        table = np.asarray(ds_fine.camera_table.cameras.camera_t_world,
                           np.float64)
        result = {
            "arm": name,
            "val_psnr": metrics.get("val_psnr"),
            "val_ssim": metrics.get("val_ssim"),
            "val_cc_psnr": metrics.get("val_cc_psnr"),
            "pose_error_injected": pose_errors(table, true_poses),
            "pose_error_stages": stage_errors,
            "pose_error_refined": pose_errors(table, true_poses, t2.scene),
        }
        t2.close()
    finally:
        os.chdir(cwd)
    (run_dir / "result.json").write_text(json.dumps(result, indent=2))
    print(json.dumps(result, indent=2), flush=True)
    return result


def main():
    if os.environ.get("M4_FORCE_CPU"):
        # sitecustomize forces the axon TPU platform regardless of
        # JAX_PLATFORMS; this must run before any device access
        import jax
        jax.config.update("jax_platforms", "cpu")
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=4000)
    p.add_argument("--out", default="runs")
    p.add_argument("--pose-noise", type=float, default=0.01,
                   help="rotation noise (rad) injected into the camera table")
    p.add_argument("--jitter", type=float, default=0.15,
                   help="per-image exposure/WB log-stddev")
    p.add_argument("--arms", default="frozen,refined",
                   help="comma list: clean, frozen, refined, refined_v2")
    p.add_argument("--num-images", type=int, default=64)
    p.add_argument("--size", type=int, nargs=2, default=(768, 512),
                   metavar=("W", "H"), help="fine image size (coarse = /4)")
    p.add_argument("--points", type=int, default=100_000)
    p.add_argument("--coarse-steps", type=int, default=2000)
    p.add_argument("--fine-steps", type=int, default=3000)
    args = p.parse_args()
    out = Path(args.out).absolute()

    scale = dict(num_images=args.num_images, image_size=tuple(args.size),
                 points=args.points)
    arms = args.arms.split(",")
    results = []
    if "clean" in arms:
        # clean-pose upper bound at the same scale/jitter (bilateral on, so
        # the only difference vs refined arms is the pose perturbation)
        results.append(run_arm(
            "clean", steps=args.steps, out=out, lr_pose=0.0,
            bilateral=True, pose_noise=0.0, jitter=args.jitter, **scale))
    if "frozen" in arms:
        results.append(run_arm(
            "frozen", steps=args.steps, out=out, lr_pose=0.0,
            bilateral=False, pose_noise=args.pose_noise, jitter=args.jitter,
            **scale))
    if "refined" in arms:
        results.append(run_arm(
            "refined", steps=args.steps, out=out, lr_pose=3e-3,
            bilateral=True, pose_noise=args.pose_noise, jitter=args.jitter,
            **scale))
    if "refined_v2" in arms:
        results.append(run_arm_v2(
            "refined_v2", out=out, pose_noise=args.pose_noise,
            jitter=args.jitter, coarse_steps=args.coarse_steps,
            fine_steps=args.fine_steps, **scale))
    if "refined_v3" in arms:
        results.append(run_arm_v3(
            "refined_v3", out=out, pose_noise=args.pose_noise,
            jitter=args.jitter, fine_steps=args.fine_steps, **scale))
    if "refined_v4" in arms:
        results.append(run_arm_v4(
            "refined_v4", out=out, pose_noise=args.pose_noise,
            jitter=args.jitter, fine_steps=args.fine_steps, **scale))
    print("\n== summary ==")
    for r in results:
        print(f"{r['arm']:8s} val_psnr={r['val_psnr']:.2f} "
              f"rot_err {r['pose_error_injected']['rot_deg']:.3f}deg -> "
              f"{r['pose_error_refined']['rot_deg']:.3f}deg  "
              f"center_err {r['pose_error_injected']['center']:.4f} -> "
              f"{r['pose_error_refined']['center']:.4f}")


if __name__ == "__main__":
    main()
