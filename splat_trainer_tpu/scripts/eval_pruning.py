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

        for frac in args.fractions:
            t = trainer.clone()
            if frac > 0:
                # prune the lowest-visibility points (the prune_cost stats
                # reset at checkpoints, so accumulated visibility is the
                # stable retained signal)
                vis = np.asarray(t.pstate.visibility)
                active = np.asarray(t.scene.active)
                score = np.where(active, vis, np.inf)
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
