"""Training CLI — the `splat-trainer` entry point.

Capability equivalent of /root/reference/splat_trainer/scripts/
train_scan.py:26-265: ergonomic flags translated into config overrides, a
run directory with the resolved config persisted for resume, dataset /
logger / trainer instantiation, train, final metrics.
"""

import argparse
import json
import os
from pathlib import Path

import numpy as np


def build_dataset(ds_cfg: dict):
    kind = ds_cfg.get("kind", "colmap")
    if kind == "colmap":
        from splat_trainer_tpu.data.colmap import COLMAPDataset
        from splat_trainer_tpu.data.normalization import NormalizationConfig
        return COLMAPDataset(
            base_path=ds_cfg["base_path"],
            image_scale=ds_cfg.get("image_scale"),
            resize_longest=ds_cfg.get("resize_longest"),
            split_every=ds_cfg.get("split_every", 8),
            normalize=NormalizationConfig(
                centering=ds_cfg.get("centering", True),
                scaling_method=ds_cfg.get("scaling_method", "none")),
            limit_images=ds_cfg.get("limit_images"))
    if kind == "blender":
        from splat_trainer_tpu.data.blender import BlenderDataset
        return BlenderDataset(
            base_path=ds_cfg["base_path"],
            image_scale=ds_cfg.get("image_scale") or 1.0,
            white_background=ds_cfg.get("white_background", True),
            limit_images=ds_cfg.get("limit_images"))
    if kind == "procedural":
        from splat_trainer_tpu.data.procedural import ProceduralDataset
        return ProceduralDataset(
            num_images=ds_cfg.get("num_images", 64),
            image_size=tuple(ds_cfg.get("image_size", (768, 512))),
            seed=ds_cfg.get("seed", 0),
            split_every=ds_cfg.get("split_every", 8),
            appearance_jitter=ds_cfg.get("appearance_jitter", 0.0),
            pose_noise=ds_cfg.get("pose_noise", 0.0),
            verbose=ds_cfg.get("verbose", False))
    if kind == "synthetic":
        from splat_trainer_tpu.data.synthetic import SyntheticDataset
        return SyntheticDataset(
            num_images=ds_cfg.get("num_images", 16),
            image_size=tuple(ds_cfg.get("image_size", (128, 128))),
            num_points=ds_cfg.get("num_points", 1000))
    raise ValueError(f"unknown dataset kind {kind}")


def build_logger(kind: str, run_path: Path):
    if kind == "tensorboard":
        from splat_trainer_tpu.logger.tensorboard import TensorboardLogger
        return TensorboardLogger(str(run_path / "tensorboard"))
    if kind == "wandb":
        from splat_trainer_tpu.logger.wandb import WandbLogger
        return WandbLogger(project="splat-trainer-tpu", name=run_path.name)
    from splat_trainer_tpu.logger import NullLogger
    return NullLogger()


def default_config_path() -> Path:
    return Path(__file__).parent.parent / "config" / "yaml" / "default.yaml"


def cfg_from_args(argv=None):
    p = argparse.ArgumentParser(description="TPU gaussian-splatting trainer")
    p.add_argument("dataset_path", nargs="?", help="COLMAP/Blender dataset dir")
    p.add_argument("--config", default=None, help="YAML config path")
    p.add_argument("--output", default="runs", help="output base dir")
    p.add_argument("--run-name", default=None)
    p.add_argument("--dataset-kind", default=None,
                   choices=["colmap", "blender", "synthetic", "procedural"])
    p.add_argument("--steps", type=int, default=None)
    p.add_argument("--target-points", type=int, default=None)
    p.add_argument("--initial-points", type=int, default=None)
    p.add_argument("--image-scale", type=float, default=None)
    p.add_argument("--resize-longest", type=int, default=None)
    p.add_argument("--limit-images", type=int, default=None)
    p.add_argument("--eval-steps", type=int, default=None)
    p.add_argument("--batch-size", type=int, default=None)
    p.add_argument("--mcmc", action="store_true", help="use the MCMC controller")
    p.add_argument("--no-densify", action="store_true")
    p.add_argument("--antialias", action="store_true")
    p.add_argument("--dp", action="store_true",
                   help="data-parallel over all local devices (batch_size "
                        "must be a multiple of the device count)")
    p.add_argument("--pp", action="store_true",
                   help="point-sharded training for city-scale scenes "
                        "(batch_size must equal the device count)")
    p.add_argument("--overlap-batching", action="store_true",
                   help="use TargetOverlap view selection")
    p.add_argument("--save-checkpoints", action="store_true")
    p.add_argument("--tensorboard", action="store_true")
    p.add_argument("--wandb", action="store_true")
    p.add_argument("--debug", action="store_true")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("overrides", nargs="*", default=[],
                   help="dotted config overrides a.b.c=value")
    args = p.parse_args(argv)

    overrides = list(args.overrides)
    # argparse greedily binds the first positional to dataset_path; when no
    # dataset dir is given, `a.b=c` overrides land there — reroute them.
    if args.dataset_path and "=" in args.dataset_path:
        overrides.insert(0, args.dataset_path)
        args.dataset_path = None

    def ov(path, value):
        if value is not None:
            overrides.append(f"{path}={value}")

    ov("dataset.base_path", args.dataset_path)
    ov("dataset.kind", args.dataset_kind)
    ov("dataset.image_scale", args.image_scale)
    ov("dataset.resize_longest", args.resize_longest)
    ov("dataset.limit_images", args.limit_images)
    ov("trainer.total_steps", args.steps)
    ov("trainer.eval_steps", args.eval_steps)
    ov("trainer.target_points", args.target_points)
    ov("trainer.cloud_init.initial_points", args.initial_points)
    if args.initial_points is not None:
        # keep the reference's default split: half of the initial points come
        # from the dataset cloud, the rest are balanced random top-up
        ov("trainer.cloud_init.limit_points", args.initial_points // 2)
    ov("trainer.view_selection.batch_size", args.batch_size)
    ov("trainer.seed", args.seed)
    if args.antialias:
        ov("trainer.antialias", "true")
    if args.dp:
        ov("trainer.dp", "true")
    if args.pp:
        ov("trainer.pp", "true")
    if args.save_checkpoints:
        ov("trainer.save_checkpoints", "true")
    if args.tensorboard:
        ov("logger", "tensorboard")
    if args.wandb:
        ov("logger", "wandb")
    return args, overrides


def train_with_config(tree: dict, run_path: Path):
    from splat_trainer_tpu.config.loader import instantiate, save_resolved
    from splat_trainer_tpu.parallel import maybe_init_distributed
    from splat_trainer_tpu.trainer.trainer import Trainer

    # a user who explicitly forces virtual host devices wants the CPU mesh
    # (the environment may pin another platform via sitecustomize)
    if "xla_force_host_platform_device_count" in os.environ.get("XLA_FLAGS", ""):
        import jax
        try:
            jax.config.update("jax_platforms", "cpu")
        except Exception:
            pass

    if maybe_init_distributed():
        import jax
        print(f"distributed: process {jax.process_index()}/"
              f"{jax.process_count()}, {jax.device_count()} devices")

    run_path.mkdir(parents=True, exist_ok=True)
    save_resolved(run_path / "config.yaml", tree)
    os.chdir(run_path)

    dataset = build_dataset(tree["dataset"])
    logger = build_logger(tree.get("logger", "none"), run_path)
    config = instantiate(tree["trainer"])

    print(f"dataset: {dataset}")
    trainer = Trainer.initialize(config, dataset, logger)
    try:
        metrics = trainer.train()
        print(json.dumps(metrics, indent=2))
        return metrics
    finally:
        trainer.close()


def build_tree(args, overrides):
    """Config tree from CLI flags + dotted overrides.

    Flag-derived component swaps happen BEFORE dotted overrides, so
    `--mcmc trainer.controller.relocate_stop_t=0.7` refines the swapped
    controller instead of being silently wiped by it (the round-5
    mcmc_m2_v2 run burned a chip slot on exactly that ordering bug)."""
    from splat_trainer_tpu.config.loader import apply_overrides, load_config

    tree = load_config(args.config or default_config_path())
    if args.mcmc:
        tree["trainer"]["controller"] = {"_target_": "MCMCConfig"}
    if args.no_densify:
        tree["trainer"]["controller"] = {"_target_": "DisabledConfig"}
    if args.overlap_batching:
        tree["trainer"]["view_selection"] = {"_target_": "TargetOverlapConfig"}
    return apply_overrides(tree, overrides)


def main(argv=None):
    args, overrides = cfg_from_args(argv)
    tree = build_tree(args, overrides)

    run_name = args.run_name or f"run_{np.random.randint(1 << 30):08x}"
    run_path = Path(args.output).absolute() / run_name
    print(f"run: {run_name} -> {run_path}")
    train_with_config(tree, run_path)


if __name__ == "__main__":
    main()
