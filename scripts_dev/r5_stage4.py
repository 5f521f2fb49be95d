"""Round-5 stage-4 chip queue: alpha8 arm + the final recorded bench.

Runs after stage 3 (which delivers the alpha2/alpha4 quality arms): the
alpha8 arm completes the speed/quality ladder (-72% instance demand at
8/255, measured), then bench.py re-runs with every quality gate resolved
so BENCH_LAST_ONCHIP/PROFILE.md record the adopted config's headline.

Usage: nohup python -m scripts_dev.r5_stage4 <deadline_unix_ts> [wait_pid] &
"""
import os
import subprocess
import sys
import time

REPO = "/root/repo"
DEADLINE = float(sys.argv[1])


def remaining():
    return DEADLINE - time.time()


def run(name, cmd, budget, min_needed, env_extra=None):
    if remaining() < min_needed:
        print(f"== {name}: SKIPPED ({remaining():.0f}s left)", flush=True)
        return
    budget = max(0.0, min(budget, remaining()))
    if budget < 60:
        print(f"== {name}: SKIPPED (budget {budget:.0f}s)", flush=True)
        return
    print(f"== {name}: starting ({remaining():.0f}s left)", flush=True)
    env = dict(os.environ, TQDM_DISABLE="1", **(env_extra or {}))
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
    if len(sys.argv) > 2:
        pid = int(sys.argv[2])
        print(f"waiting for pid {pid} to exit...", flush=True)
        while os.path.exists(f"/proc/{pid}") and remaining() > 900:
            time.sleep(30)
        print(f"pid {pid} gone ({remaining():.0f}s left)", flush=True)

    # finish mcmc_m2_v3's last 1000 steps (the fresh run timed out at its
    # step-6000 eval — already +2.6 dB over the untuned ending and above
    # the Disabled comparator there; the VERDICT criterion is step 7000)
    run("mcmc_v3_tail",
        [sys.executable, "-m",
         "splat_trainer_tpu.scripts.checkpoint_tools", "resume",
         "runs/mcmc_m2_v3"], budget=1500, min_needed=900)
    # alpha8 dropped: alpha2 already fails the quality gate by -0.59 dB
    # (runs/ab_alpha2), so the coarser rungs can only be worse — the
    # alpha2/alpha4 arms record the speed/quality curve's shape.
    run("bench_final",
        [sys.executable, "bench.py"], budget=2700, min_needed=900,
        env_extra={"BENCH_BUDGET_S": "2400"})
    print("r5 stage4 done; chip free", flush=True)


if __name__ == "__main__":
    main()
