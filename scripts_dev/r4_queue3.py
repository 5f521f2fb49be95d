"""Round-4 unattended chip queue, stage 3 (the definitive one this round).

Serially, with a global deadline guaranteeing the chip is free for the
round-end bench:
  1. MCMC at m2 scale (VERDICT r3 item 3 — final ask): 100k points fixed
     count, 768x512, 7000 steps, MCMCController. Equal-count Disabled
     comparator = committed runs/m2_fixed100k (identical recipe).
  2. Pose recovery v4 (VERDICT r3 item 5): correspondence/PnP alignment
     (cameras/align.py) at full m4 scale.
  3. The 30k-iteration garden run at HEAD with target_points=1M
     (VERDICT r3 item 4): fresh run on the m3_r3 recipe (opacity resets,
     target_count_t=0.7), eval/checkpoint every 2000 steps so a deadline
     kill still leaves the latest garden-class checkpoint for bench.py.

Extra trainer overrides for the 30k run (e.g. the bench-measured kernel
knobs) are passed through argv after the deadline.

Usage: nohup python -m scripts_dev.r4_queue3 <deadline_unix_ts> [k=v ...] &
"""
import os
import subprocess
import sys
import time

REPO = "/root/repo"
DEADLINE = float(sys.argv[1])
EXTRA = [a for a in sys.argv[2:]]


def remaining():
    return DEADLINE - time.time()


def run(name, cmd, budget, min_needed=None):
    # clamp: a caller computing budget=remaining()-X can go negative when
    # the script starts late; a negative budget must skip, not run with a
    # silent 60 s timeout (ADVICE r4)
    budget = max(0.0, budget)
    if budget < 60 or \
            remaining() < (min_needed if min_needed is not None
                           else budget * 0.5):
        print(f"== {name}: SKIPPED ({remaining():.0f}s left, "
              f"budget {budget:.0f}s)", flush=True)
        return
    print(f"== {name}: starting ({remaining():.0f}s left)", flush=True)
    env = dict(os.environ, TQDM_DISABLE="1")
    with open(f"/tmp/{name}.out", "w") as f:
        try:
            subprocess.run(cmd, cwd=REPO, stdout=f, env=env,
                           stderr=subprocess.STDOUT,
                           timeout=max(60, min(budget, remaining())))
            print(f"== {name}: done ({remaining():.0f}s left)", flush=True)
        except subprocess.TimeoutExpired:
            print(f"== {name}: TIMEOUT/deadline kill after "
                  f"{budget:.0f}s budget", flush=True)


def main():
    # Longest job first: the 30k garden run is the round's headline
    # deliverable and must leave its final checkpoint before the round-end
    # bench. Budget = everything except a reserve for MCMC (the r3
    # verdict's final ask) + pose v4 + a tail margin; every 2000 steps it
    # writes an eval + checkpoint, so a budget kill still leaves the
    # latest garden-class checkpoint for bench.py.
    run("m3_30k",
        [sys.executable, "-m", "splat_trainer_tpu.scripts.train",
         "--config", "runs/m3_r3/config.yaml",
         "--run-name", "m3_30k", "--steps", "30000",
         "--target-points", "1000000", "--eval-steps", "2000",
         "--tensorboard", "--save-checkpoints",
         "trainer.max_instances=8388608",
         "trainer.max_render_instances=6291456",
         ] + EXTRA,
        budget=remaining() - 6000, min_needed=1800)
    run("mcmc_m2",
        [sys.executable, "-m", "splat_trainer_tpu.scripts.train",
         "--dataset-kind", "procedural", "--run-name", "mcmc_m2",
         "--steps", "7000", "--target-points", "100000",
         "--initial-points", "100000", "--mcmc", "--tensorboard",
         "--save-checkpoints",
         "dataset.num_images=64", "dataset.image_size=[768,512]",
         "dataset.split_every=8"], budget=2700, min_needed=900)
    run("m4_v4",
        [sys.executable, "-m", "scripts_dev.m4_pose_bilateral",
         "--arms", "refined_v4", "--fine-steps", "3000"],
        budget=2400, min_needed=900)
    print("r4 queue stage 3 done; chip free", flush=True)


if __name__ == "__main__":
    main()
