"""Round-5 stage-2 chip queue: runs after the r5 opener queue frees the chip.

  1. Op-level trace of the train step at the 1M-point garden workload
     (scripts_dev/trace_step.py at the bench-bucketed capacities) — the
     attribution that picks this round's throughput levers (VERDICT r4 #1:
     the step is stream/latency-bound, so know WHICH ops before touching
     kernels).
  2. Quality A/B arm `batch4` (scripts_dev/quality_ab.py) — gates bench.py's
     batch-accumulation headline probe.
  3. bench.py under a budget — validates the headline-first restructure on
     the real chip and records the round's official number at whatever
     checkpoint is newest (the finished 30k run, if step 1 completed it).

Usage: nohup python -m scripts_dev.r5_stage2 <deadline_unix_ts> [wait_pid] &
With wait_pid, polls until that PID exits before starting (chains after the
r5_queue process without sharing its shell).
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
        print(f"== {name}: SKIPPED (budget {budget:.0f}s < 60s)", flush=True)
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
        while os.path.exists(f"/proc/{pid}") and remaining() > 600:
            time.sleep(30)
        print(f"pid {pid} gone ({remaining():.0f}s left)", flush=True)

    run("trace_1m",
        [sys.executable, "-m", "scripts_dev.trace_step",
         "3670016", "2883584", "5"], budget=1200, min_needed=600)
    run("trace_ops_1m",
        [sys.executable, "-m", "scripts_dev.trace_ops",
         "/tmp/jaxtrace_step", "--top", "50"], budget=600, min_needed=120)
    run("ab_batch4",
        [sys.executable, "-m", "scripts_dev.quality_ab", "batch4",
         "--deadline", str(DEADLINE - 2700)], budget=4200, min_needed=1800)
    run("bench_r5",
        [sys.executable, "bench.py"], budget=2700, min_needed=900,
        env_extra={"BENCH_BUDGET_S": "2400"})
    print("r5 stage2 done; chip free", flush=True)


if __name__ == "__main__":
    main()
