"""Prune-quality sweep: how much can be pruned at what PSNR cost.

Capability equivalent of /root/reference/splat_trainer/scripts/
eval_pruning.py:64-146: evaluate metrics after pruning increasing fractions
of the lowest-cost points, optionally fine-tuning after each prune level.
"""

import argparse
import json

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("workspace")
    p.add_argument("--step", type=int, default=None)
    p.add_argument("--fractions", type=float, nargs="+",
                   default=[0.0, 0.1, 0.25, 0.5, 0.75])
    p.add_argument("--retrain-steps", type=int, default=0,
                   help="fine-tune steps after each prune level")
    args = p.parse_args(argv)

    from splat_trainer_tpu.scripts.checkpoint_tools import with_trainer

    def run(trainer, _args):
        import jax.numpy as jnp

        trainer.dataset.load_images()
        base = trainer.state_dict()
        results = {}

        # Rebuild the controller's *actual* prune signal: checkpointed
        # PointState resets at densify/checkpoint boundaries, so accumulate
        # fresh prune_cost with one backward per training view (exactly the
        # statistics the TargetController ranks by — reference
        # eval_pruning.py:64-146).
        import functools

        import jax

        from splat_trainer_tpu.controller.point_state import PointState
        from splat_trainer_tpu.trainer.train_step import batch_gradients, make_hyper

        grad_fn = jax.jit(functools.partial(
            batch_gradients,
            scene_config=trainer.config.scene,
            raster_config=trainer.config.raster_config(),
            image_size=trainer.camera_table.image_size,
            ssim_levels=trainer.config.ssim_levels))
        hyper = make_hyper(trainer.config.scene, trainer.config,
                           trainer.progress.t)
        fresh = PointState.new_zeros(trainer.scene.capacity)
        for view in trainer.dataset.train(shuffle=False):
            bundle = grad_fn(trainer.scene,
                             trainer.make_batch([view]), hyper)
            fresh = fresh.add_rendering(
                in_view=bundle.in_view_any, visibility=bundle.vis_acc,
                screen_scale=bundle.scale_max,
                split_score=bundle.heur[:, 0], prune_cost=bundle.heur[:, 1])
        prune_cost = np.asarray(fresh.prune_cost)

        for frac in args.fractions:
            t = trainer.clone()
            if frac > 0:
                active = np.asarray(t.scene.active)
                score = np.where(active, prune_cost, np.inf)
                n_prune = int(active.sum() * frac)
                idx = np.argsort(score)[:n_prune]
                new_active = active.copy()
                new_active[idx] = False
                t.scene = t.scene.replace(active=jnp.asarray(new_active))

            if args.retrain_steps > 0:
                t.update_config(total_steps=t.step + args.retrain_steps,
                                eval_steps=10 ** 9, save_output=False)
                t.train()

            metrics = t.evaluate()
            metrics["points"] = int(np.asarray(t.scene.active).sum())
            results[f"prune_{frac:.2f}"] = metrics
            print(f"prune {frac:.2f}: {metrics}")

        print(json.dumps(results, indent=2))
        return results

    with_trainer(run, [args.workspace] + (
        ["--step", str(args.step)] if args.step is not None else []),
        "prune-quality sweep")


if __name__ == "__main__":
    main()
