"""Round-4 watchdog queue: bound the detached 30k run, then MCMC + pose v4.

The m3_30k trainer (pid file /tmp/m3_30k.pid) was detached from its
original fixed-budget queue so it can use every spare second; this
watchdog enforces the NEW bound: at kill_ts (argv[1]) the run is killed
(its eval-interval checkpoints survive — resume-able next round), then
the remaining chip jobs run with tight budgets inside the global deadline
(argv[2]): MCMC at m2 scale (VERDICT r3 item 3, final ask) and pose
recovery v4 (item 5).

Usage: nohup python -m scripts_dev.r4_queue4 <kill_ts> <deadline_ts> &
"""
import os
import signal
import subprocess
import sys
import time
from pathlib import Path

REPO = "/root/repo"
KILL_TS = float(sys.argv[1])
DEADLINE = float(sys.argv[2])


def remaining():
    return DEADLINE - time.time()


def wait_and_bound_30k():
    pid_file = Path("/tmp/m3_30k.pid")
    if not pid_file.exists():
        return
    pid = int(pid_file.read_text().strip())
    while os.path.exists(f"/proc/{pid}"):
        if time.time() >= KILL_TS:
            print(f"killing m3_30k (pid {pid}) at bound", flush=True)
            try:
                os.kill(pid, signal.SIGTERM)
                time.sleep(20)
                if os.path.exists(f"/proc/{pid}"):
                    os.kill(pid, signal.SIGKILL)
            except ProcessLookupError:
                pass
            break
        time.sleep(20)
    print(f"m3_30k done/killed ({remaining():.0f}s to deadline)", flush=True)


def run(name, cmd, budget, min_needed):
    if remaining() < min_needed:
        print(f"== {name}: SKIPPED ({remaining():.0f}s left)", flush=True)
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
            print(f"== {name}: TIMEOUT after {budget:.0f}s", flush=True)


def main():
    wait_and_bound_30k()
    run("mcmc_m2",
        [sys.executable, "-m", "splat_trainer_tpu.scripts.train",
         "--dataset-kind", "procedural", "--run-name", "mcmc_m2",
         "--steps", "7000", "--target-points", "100000",
         "--initial-points", "100000", "--mcmc", "--tensorboard",
         "--save-checkpoints",
         "dataset.num_images=64", "dataset.image_size=[768,512]",
         "dataset.split_every=8"], budget=1800, min_needed=1200)
    run("m4_v4",
        [sys.executable, "-m", "scripts_dev.m4_pose_bilateral",
         "--arms", "refined_v4", "--fine-steps", "800"],
        budget=1200, min_needed=500)
    print("r4 queue stage 4 done; chip free", flush=True)


if __name__ == "__main__":
    main()
