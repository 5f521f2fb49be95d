"""Round-3 TPU queue, take 2 (the first control arm burned its subprocess
timeout rendering the dataset cache; the cache is now warm so reruns fit).

Waits for the in-flight ab_scan_bf16 arm, then runs the jobs in
comparison-critical order: the control anchor first, pack_off, the MCMC
m2 run, and the pose EM last (the one to sacrifice if the round ends)."""
import os
import subprocess
import sys
import time

REPO = "/root/repo"
WAIT_PID = int(sys.argv[1]) if len(sys.argv) > 1 else None


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
        except Exception as e:
            rc = f"error: {e}"
    print(f"== {name}: rc={rc} in {time.time()-t0:.0f}s", flush=True)


def main():
    if WAIT_PID:
        while os.path.exists(f"/proc/{WAIT_PID}"):
            time.sleep(15)
        print(f"pid {WAIT_PID} finished; queue starting", flush=True)
    run("m4_pose_v3",
        [sys.executable, "scripts_dev/m4_pose_bilateral.py",
         "--arms", "refined_v3"],
        timeout=3600)
    run("mcmc_m2",
        [sys.executable, "-m", "splat_trainer_tpu.scripts.train",
         "--dataset-kind", "procedural", "--run-name", "mcmc_m2",
         "--steps", "7000", "--target-points", "100000",
         "--initial-points", "100000", "--mcmc", "--tensorboard",
         "--save-checkpoints",
         "dataset.num_images=64", "dataset.image_size=[768,512]",
         "dataset.split_every=8"],
        timeout=2400)
    run("ab_control2",
        [sys.executable, "scripts_dev/quality_ab.py", "control", "pack_off"],
        timeout=3600)
    print("queue done", flush=True)


if __name__ == "__main__":
    main()
