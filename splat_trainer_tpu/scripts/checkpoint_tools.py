"""Checkpoint CLI tools: resume / evaluate / write-sh-gaussians.

Capability equivalent of /root/reference/splat_trainer/scripts/
checkpoint.py:23-238: find the latest (or a specific) checkpoint under a
run dir, reload its saved config with dotted-path overrides, rebuild the
Trainer from state, and run a subcommand.
"""

import argparse
import json
import os
from pathlib import Path


def with_trainer(f, argv=None, description=""):
    p = argparse.ArgumentParser(description=description)
    p.add_argument("workspace", help="run directory containing config.yaml")
    p.add_argument("--step", type=int, default=None,
                   help="checkpoint step (default: latest)")
    p.add_argument("overrides", nargs="*", default=[],
                   help="dotted config overrides a.b.c=value")
    args = p.parse_args(argv)

    from splat_trainer_tpu.config.loader import (
        apply_overrides, instantiate, load_config,
    )
    from splat_trainer_tpu.logger import NullLogger
    from splat_trainer_tpu.scripts.train import build_dataset, build_logger
    from splat_trainer_tpu.trainer import checkpoint as ckpt
    from splat_trainer_tpu.trainer.trainer import Trainer

    workspace = Path(args.workspace).absolute()
    tree = load_config(workspace / "config.yaml")
    tree = apply_overrides(tree, list(args.overrides))

    if args.step is not None:
        path = workspace / "checkpoint" / f"checkpoint_{args.step}"
    else:
        path = ckpt.find_latest_checkpoint(workspace)
    print(f"loading {path}")

    dataset = build_dataset(tree["dataset"])
    config = instantiate(tree["trainer"])
    logger = build_logger(tree.get("logger", "none"), workspace)

    os.chdir(workspace)
    template = Trainer.initialize(config, dataset, NullLogger())
    state = ckpt.load_checkpoint(path, template.scene, template.pstate)
    trainer = Trainer.from_state_dict(config, dataset, logger, state)
    try:
        return f(trainer, args)
    finally:
        trainer.close()


def resume_main(argv=None):
    def run(trainer, args):
        metrics = trainer.train()
        print(json.dumps(metrics, indent=2))

    with_trainer(run, argv, "resume training from a checkpoint")


def evaluate_main(argv=None):
    def run(trainer, args):
        trainer.dataset.load_images()
        metrics = trainer.evaluate()
        print(json.dumps(metrics, indent=2))

    with_trainer(run, argv, "evaluate a checkpoint")


def write_sh_main(argv=None):
    def run(trainer, args):
        from splat_trainer_tpu.models.io import write_gaussians
        paths = trainer.paths()
        g = trainer.sh_gaussians()
        write_gaussians(paths.point_cloud, g, with_sh=True)
        print(f"wrote {g.num_points} gaussians to {paths.point_cloud}")

    with_trainer(run, argv, "export SH-distilled gaussians to ply")


def main(argv=None):
    """Subcommand dispatch: `... checkpoint_tools {resume,evaluate,write-sh} ...`.

    A bare invocation (no recognized subcommand) keeps the historical
    behavior of resuming, so `... checkpoint_tools runs/x` still works.
    """
    import sys
    argv = list(sys.argv[1:] if argv is None else argv)
    commands = {"resume": resume_main, "evaluate": evaluate_main,
                "write-sh": write_sh_main}
    if argv and argv[0] in commands:
        commands[argv[0]](argv[1:])
    else:
        resume_main(argv)


if __name__ == "__main__":
    main()
