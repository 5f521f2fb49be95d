"""Round-5 opener chip queue (written at the end of round 4).

Serially, with a global deadline:
  1. Pose recovery v4 (displaced from round 4 by chip triage — RESULTS.md
     round-4 pose section): correspondence/PnP alignment at full m4
     scale. The m4/m4_c2/m4_c4 dataset caches are prefill presets
     (scripts_dev/jax_cache_prefill.py) — prefill them FIRST if /tmp was
     wiped, or every stage pays ~52 s/image host renders.
  2. Resume runs/m3_30k from checkpoint_22000 to step 30000 — the
     refinement tail of the 30k 1M-point garden run (the schedules
     continue at absolute t; opacity resets stop at t=0.75).
  3. MCMC m2 rerun with the round-4 analysis knobs
     (relocate_stop_t=0.7) to validate the late-schedule fix against
     both the committed MCMC run and the Disabled comparator.

Usage: nohup python -m scripts_dev.r5_queue <deadline_unix_ts> &
"""
import os
import subprocess
import sys
import time

REPO = "/root/repo"
DEADLINE = float(sys.argv[1])


def remaining():
    return DEADLINE - time.time()


def run(name, cmd, budget, min_needed):
    if remaining() < min_needed:
        print(f"== {name}: SKIPPED ({remaining():.0f}s left)", flush=True)
        return
    budget = max(0.0, min(budget, remaining()))
    if budget < 60:
        print(f"== {name}: SKIPPED (budget {budget:.0f}s < 60s)", flush=True)
        return
    print(f"== {name}: starting ({remaining():.0f}s left)", flush=True)
    env = dict(os.environ, TQDM_DISABLE="1")
    with open(f"/tmp/{name}.out", "w") as f:
        try:
            proc = subprocess.run(cmd, cwd=REPO, stdout=f, env=env,
                                  stderr=subprocess.STDOUT, timeout=budget)
            status = "done" if proc.returncode == 0 else \
                f"FAILED rc={proc.returncode} (see /tmp/{name}.out)"
            print(f"== {name}: {status} ({remaining():.0f}s left)", flush=True)
        except subprocess.TimeoutExpired:
            print(f"== {name}: TIMEOUT after {budget:.0f}s", flush=True)


def main():
    cache = os.environ.get("PROC_DATASET_CACHE", "/tmp/proc_dataset_cache")
    cold = not os.path.isdir(cache) or len(os.listdir(cache)) < 320
    if cold:
        for preset in ("garden", "m2", "m4", "m4_c2", "m4_c4"):
            run(f"prefill_{preset}",
                [sys.executable, "-m", "scripts_dev.jax_cache_prefill",
                 preset], budget=1200, min_needed=600)
    # 30k tail first: it is the round's headline deliverable (VERDICT r4 #3)
    run("m3_30k_tail",
        [sys.executable, "-m", "splat_trainer_tpu.scripts.checkpoint_tools",
         "resume", "runs/m3_30k"], budget=9000, min_needed=3000)
    run("m4_v4",
        [sys.executable, "-m", "scripts_dev.m4_pose_bilateral",
         "--arms", "refined_v4", "--fine-steps", "2000"],
        budget=3000, min_needed=1500)
    run("mcmc_m2_v2",
        [sys.executable, "-m", "splat_trainer_tpu.scripts.train",
         "--dataset-kind", "procedural", "--run-name", "mcmc_m2_v2",
         "--steps", "7000", "--target-points", "100000",
         "--initial-points", "100000", "--mcmc", "--tensorboard",
         "--save-checkpoints",
         "trainer.controller.relocate_stop_t=0.7",
         "dataset.num_images=64", "dataset.image_size=[768,512]",
         "dataset.split_every=8"], budget=3000, min_needed=1500)
    print("r5 opener queue done; chip free", flush=True)


if __name__ == "__main__":
    main()
