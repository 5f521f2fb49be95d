"""Round-4 unattended chip queue, stage 1.

Waits for the quality-A/B queue (pid file) to release the chip, then runs
serially:
  1. MCMC at m2 scale (VERDICT r3 item 3 — third ask): 100k points fixed
     count, 768x512, 7000 steps, MCMCController. The equal-count Disabled
     comparison arm is the committed runs/m2_fixed100k (identical recipe).
  2. Pose recovery v4 (VERDICT r3 item 5): correspondence-based
     consensus/align alternation at full m4 scale.

Each job gets its own timeout; a global deadline (argv[1], seconds from
launch) guarantees the chip is free for interactive work / the round-end
bench.

Usage: nohup python -m scripts_dev.r4_queue [deadline_s] &
"""
import json
import os
import subprocess
import sys
import time
from pathlib import Path

REPO = "/root/repo"
DEADLINE = time.time() + (float(sys.argv[1]) if len(sys.argv) > 1 else 9000)


def remaining():
    return DEADLINE - time.time()


def wait_for_ab():
    pid_file = Path("/tmp/ab_queue_r4.pid")
    if not pid_file.exists():
        return
    pid = pid_file.read_text().strip()
    while os.path.exists(f"/proc/{pid}") and remaining() > 300:
        time.sleep(20)
    print(f"ab queue done ({remaining():.0f}s budget left)", flush=True)


def run(name, cmd, budget):
    if remaining() < budget * 0.5:
        print(f"== {name}: SKIPPED ({remaining():.0f}s left < "
              f"{budget * 0.5:.0f})", flush=True)
        return
    print(f"== {name}: starting ({remaining():.0f}s left)", flush=True)
    with open(f"/tmp/{name}.out", "w") as f:
        try:
            subprocess.run(cmd, cwd=REPO, stdout=f,
                           stderr=subprocess.STDOUT,
                           timeout=min(budget, max(60, remaining())))
            print(f"== {name}: done", flush=True)
        except subprocess.TimeoutExpired:
            print(f"== {name}: TIMEOUT after {budget}s", flush=True)


def main():
    wait_for_ab()
    run("mcmc_m2",
        [sys.executable, "-m", "splat_trainer_tpu.scripts.train",
         "--dataset-kind", "procedural", "--run-name", "mcmc_m2",
         "--steps", "7000", "--target-points", "100000",
         "--initial-points", "100000", "--mcmc", "--tensorboard",
         "--save-checkpoints",
         "dataset.num_images=64", "dataset.image_size=[768,512]",
         "dataset.split_every=8"], budget=4000)
    run("m4_v4",
        [sys.executable, "-m", "scripts_dev.m4_pose_bilateral",
         "--arms", "refined_v4", "--fine-steps", "3000"], budget=4000)
    print("r4 queue stage 1 done; chip free", flush=True)


if __name__ == "__main__":
    main()
