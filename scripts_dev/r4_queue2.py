"""Round-4 unattended chip queue, stage 2.

Waits for the m3_30k run (pid file /tmp/m3_30k.pid) to release the chip,
then serially:
  1. MCMC at m2 scale (VERDICT r3 item 3 — final ask): 100k fixed count,
     768x512, 7000 steps, MCMCController; equal-count Disabled comparison
     is the committed runs/m2_fixed100k.
  2. Pose recovery v4 (VERDICT r3 item 5): correspondence/PnP alignment
     with the photometric acceptance guard, full m4 scale.
  3. Fresh op-level trace of the train step on the NEW 30k checkpoint
     (bench-selected), for the round's attribution table.

Usage: nohup python -m scripts_dev.r4_queue2 [deadline_s] &
"""
import os
import subprocess
import sys
import time
from pathlib import Path

REPO = "/root/repo"
DEADLINE = time.time() + (float(sys.argv[1]) if len(sys.argv) > 1 else 18000)


def remaining():
    return DEADLINE - time.time()


def wait_for_pid_file(path):
    p = Path(path)
    if not p.exists():
        return
    pid = p.read_text().strip()
    while os.path.exists(f"/proc/{pid}") and remaining() > 300:
        time.sleep(30)
    print(f"{path} released ({remaining():.0f}s budget left)", flush=True)


def run(name, cmd, budget):
    if remaining() < budget * 0.5:
        print(f"== {name}: SKIPPED ({remaining():.0f}s left)", flush=True)
        return
    print(f"== {name}: starting ({remaining():.0f}s left)", flush=True)
    env = dict(os.environ, TQDM_DISABLE="1")
    with open(f"/tmp/{name}.out", "w") as f:
        try:
            subprocess.run(cmd, cwd=REPO, stdout=f, env=env,
                           stderr=subprocess.STDOUT,
                           timeout=min(budget, max(60, remaining())))
            print(f"== {name}: done", flush=True)
        except subprocess.TimeoutExpired:
            print(f"== {name}: TIMEOUT after {budget}s", flush=True)


def main():
    wait_for_pid_file("/tmp/m3_30k.pid")
    run("mcmc_m2",
        [sys.executable, "-m", "splat_trainer_tpu.scripts.train",
         "--dataset-kind", "procedural", "--run-name", "mcmc_m2",
         "--steps", "7000", "--target-points", "100000",
         "--initial-points", "100000", "--mcmc", "--tensorboard",
         "--save-checkpoints",
         "dataset.num_images=64", "dataset.image_size=[768,512]",
         "dataset.split_every=8"], budget=4500)
    run("m4_v4",
        [sys.executable, "-m", "scripts_dev.m4_pose_bilateral",
         "--arms", "refined_v4", "--fine-steps", "3000"], budget=5000)
    run("trace_step",
        [sys.executable, "scripts_dev/ab_step.py", "--trace",
         "--iters", "20"], budget=1800)
    run("trace_ops",
        [sys.executable, "scripts_dev/trace_ops.py", "/tmp/jaxtrace",
         "--top", "45"], budget=600)
    print("r4 queue stage 2 done; chip free", flush=True)


if __name__ == "__main__":
    main()
