"""Round-3 final chip jobs with a hard deadline.

Waits for the running pose EM job, runs the MCMC m2 arm, then exits and
leaves the chip free for the driver's round-end bench. A global deadline
kills whatever is still running so no detached job can contend with the
driver's benchmark after the session ends."""
import os
import signal
import subprocess
import sys
import time

REPO = "/root/repo"
POSE_PID = int(sys.argv[1])
DEADLINE = time.time() + float(sys.argv[2]) if len(sys.argv) > 2 else \
    time.time() + 2700


def remaining():
    return DEADLINE - time.time()


def main():
    while os.path.exists(f"/proc/{POSE_PID}") and remaining() > 300:
        time.sleep(15)
    if os.path.exists(f"/proc/{POSE_PID}"):
        print("deadline: killing pose job", flush=True)
        try:
            os.kill(POSE_PID, signal.SIGKILL)
        except OSError:
            pass
        return
    if remaining() < 600:
        print("deadline too close; skipping MCMC", flush=True)
        return
    print(f"pose done; MCMC with {remaining():.0f}s budget", flush=True)
    with open("/tmp/mcmc_m2.out", "w") as f:
        try:
            subprocess.run(
                [sys.executable, "-m", "splat_trainer_tpu.scripts.train",
                 "--dataset-kind", "procedural", "--run-name", "mcmc_m2",
                 "--steps", "7000", "--target-points", "100000",
                 "--initial-points", "100000", "--mcmc", "--tensorboard",
                 "--save-checkpoints",
                 "dataset.num_images=64", "dataset.image_size=[768,512]",
                 "dataset.split_every=8"],
                cwd=REPO, stdout=f, stderr=subprocess.STDOUT,
                timeout=max(60, remaining()))
        except subprocess.TimeoutExpired:
            print("MCMC hit the deadline; killed", flush=True)
    print("finish-queue done; chip free", flush=True)


if __name__ == "__main__":
    main()
