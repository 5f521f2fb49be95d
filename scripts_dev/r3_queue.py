"""Round-3 serial TPU job queue.

The single chip runs jobs back-to-back without idle gaps: waits for the
in-flight quality A/B campaign (scripts_dev/quality_ab.py) to finish,
then runs the merged scan-bf16 quality arm, the m2-scale MCMC controller
run (VERDICT r3 item 5), and the EM-alternation pose recovery (VERDICT
r3 item 4). Each job's stdout goes to /tmp/<name>.out; results land in
runs/ as usual.
"""
import os
import subprocess
import sys
import time

REPO = "/root/repo"


def wait_pid(pidfile):
    try:
        pid = int(open(pidfile).read().strip())
    except (OSError, ValueError):
        return
    while os.path.exists(f"/proc/{pid}"):
        time.sleep(20)


def run(name, argv, timeout):
    print(f"== {name}: {' '.join(argv)}", flush=True)
    t0 = time.time()
    with open(f"/tmp/{name}.out", "w") as f:
        try:
            r = subprocess.run(argv, cwd=REPO, stdout=f,
                               stderr=subprocess.STDOUT, timeout=timeout)
            rc = r.returncode
        except subprocess.TimeoutExpired:
            rc = "timeout"
    print(f"== {name}: rc={rc} in {time.time()-t0:.0f}s", flush=True)


def main():
    jobs = sys.argv[1:] or ["scan", "mcmc", "pose"]
    wait_pid("/tmp/quality_ab.pid")
    print("quality_ab finished; queue starting", flush=True)
    if "scan" in jobs:
        run("ab_scan_bf16",
            [sys.executable, "scripts_dev/quality_ab.py", "scan_bf16"],
            timeout=4500)
    if "mcmc" in jobs:
        run("mcmc_m2",
            [sys.executable, "-m", "splat_trainer_tpu.scripts.train",
             "--dataset-kind", "procedural", "--run-name", "mcmc_m2",
             "--steps", "7000", "--target-points", "100000",
             "--initial-points", "100000", "--mcmc", "--tensorboard",
             "--save-checkpoints",
             "dataset.num_images=64", "dataset.image_size=[768,512]",
             "dataset.split_every=8"],
            timeout=3000)
    if "pose" in jobs:
        run("m4_pose_v3",
            [sys.executable, "scripts_dev/m4_pose_bilateral.py",
             "--arms", "refined_v3"],
            timeout=3600)
    print("queue done", flush=True)


if __name__ == "__main__":
    main()
