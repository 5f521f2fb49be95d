"""Garden-scale quality A/B (VERDICT r3 item 3, hardened per r3 item 6).

Protocol: only the FINAL m3_r3 checkpoint (step 12000) is committed, so
each arm resumes it and trains 2000 further steps (total_steps=14000)
under one kernel-knob override, evaluating at 13000/14000. A `control`
arm (no knob override) provides the comparison point: every arm shares
the identical start state, step budget, and schedule normalization, so
eval deltas isolate the knob.

Robustness (r3's control arm burned its subprocess timeout rendering the
dataset cache):
  * cache-warm step — the garden image cache is prefilled ONCE on the
    chip (scripts_dev/jax_cache_prefill.py, ~1 min cold / no-op warm)
    before any timed arm launches;
  * per-arm wall-clock budget check — with --deadline <epoch-seconds>,
    an arm only launches if the remaining budget covers the expected arm
    time (ARM_EXPECTED_S), so a queue never half-burns its last arm;
  * auto-retry — a failed arm (timeout / unparseable metrics) is retried
    once before the queue moves on.

Serial on the single chip; each arm gets its own workspace so the source
run's checkpoint stays untouched.
"""
import json
import shutil
import subprocess
import sys
import time
from pathlib import Path

SRC = Path("/root/repo/runs/m3_r3")
STEP = 12000
EXTEND = ["trainer.total_steps=14000"]
ARMS = {
    "control": [],
    "pack_off": ["trainer.grad_bf16_pack=false"],
    "bwd_scan_bf16": ["trainer.bwd_scan_bf16=true"],
    "fwd_scan_bf16": ["trainer.fwd_scan_bf16=true"],
    # merged arm: bwd_scan_bf16 is gradient-only and already golden-gated at
    # CPU scale, so a quality delta in this arm attributes to the forward half
    "scan_bf16": ["trainer.bwd_scan_bf16=true", "trainer.fwd_scan_bf16=true"],
    # tile_size has a kernel-level parity test (test_tile_size_parity) but the
    # judge asked for the training arm too (VERDICT r3 item 2)
    "ts16": ["trainer.tile_size=16"],
    # batch accumulation (VERDICT r4 #1c): 4 images per optimizer step,
    # EQUAL-IMAGE protocol — 500 steps x 4 images = control's 2000 images,
    # and both arms end at t=1.0 of their own schedules (overrides are
    # last-wins, so total_steps=12500 displaces EXTEND's 14000). The
    # optimizer's second-moment normalization makes the sum-accumulated
    # gradient roughly lr-neutral; this arm verifies that at scale before
    # bench.py may adopt the batch4 headline.
    # eval_steps=500 so the final eval actually fires at 12500 (12500 %
    # 2000 != 0 would leave the checkpoint's stale metrics as the result)
    "batch4": ["trainer.total_steps=12500", "trainer.eval_steps=500",
               "trainer.view_selection.batch_size=4"],
    # binning/compositing alpha threshold (approximation-class): measured
    # at checkpoint_30000, 2/255 drops 25% of visible splats / 31% of
    # instance demand — the single largest instance-count lever found.
    # The arm trains AND evals at the raised threshold, so the measured
    # delta includes any optimization-dynamics effect, not just render
    # error.
    "alpha2": ["trainer.alpha_threshold=0.00784314"],
    "alpha4": ["trainer.alpha_threshold=0.01568627"],
    "alpha8": ["trainer.alpha_threshold=0.03137255"],
}
ARM_TIMEOUT_S = 4200
# 2000 steps @ ~250 ms + compile (~90 s) + 2 evals (~120 s) + load — observed
# ~800-1000 s per arm at garden scale; budget with headroom
ARM_EXPECTED_S = 1500


def warm_cache():
    print("== cache warm (jax_cache_prefill garden)", flush=True)
    r = subprocess.run(
        [sys.executable, "-m", "scripts_dev.jax_cache_prefill", "garden"],
        cwd="/root/repo", capture_output=True, text=True, timeout=1800)
    print(r.stdout.strip()[-500:], flush=True)
    if r.returncode != 0:
        print(r.stderr[-2000:], flush=True)
        raise SystemExit("cache warm failed")


def run_arm(name, dst, overrides):
    r = subprocess.run(
        [sys.executable, "-m",
         "splat_trainer_tpu.scripts.checkpoint_tools",
         str(dst), *overrides, "--step", str(STEP)],
        cwd="/root/repo", capture_output=True, text=True,
        timeout=ARM_TIMEOUT_S)
    out = r.stdout
    (dst / "resume.log").write_text(out + "\n--- stderr ---\n" + r.stderr)
    # final JSON metrics block is the last {...} in stdout
    j = out[out.rindex("{"):]
    metrics = json.loads(j)
    (dst / "result.json").write_text(json.dumps(
        {"arm": name, "overrides": overrides, **metrics}, indent=2))
    return metrics


def main():
    # hand-rolled so `--deadline <ts>`'s VALUE doesn't leak into the arm
    # list (it did: the round-5 stage-2 run crashed on KeyError('<ts>')
    # after its arms completed)
    args, deadline = [], None
    it = iter(sys.argv[1:])
    for a in it:
        if a == "--deadline":
            deadline = float(next(it))
        elif not a.startswith("-"):
            args.append(a)
    unknown = [a for a in args if a not in ARMS]
    if unknown:
        raise SystemExit(f"unknown arms {unknown}; known: {list(ARMS)}")
    names = args or list(ARMS)
    warm_cache()
    for name in names:
        dst = Path(f"/root/repo/runs/ab_{name}")
        if (dst / "result.json").exists():
            print(f"== {name}: already done"); continue
        if deadline is not None and time.time() + ARM_EXPECTED_S > deadline:
            print(f"== {name}: SKIPPED — {deadline - time.time():.0f}s left "
                  f"< expected {ARM_EXPECTED_S}s", flush=True)
            continue
        dst.mkdir(parents=True, exist_ok=True)
        shutil.copy(SRC / "config.yaml", dst / "config.yaml")
        shutil.copy(SRC / "cameras.json", dst / "cameras.json")
        (dst / "checkpoint").mkdir(exist_ok=True)
        ck = dst / "checkpoint" / f"checkpoint_{STEP}"
        if not ck.exists():
            shutil.copytree(SRC / "checkpoint" / f"checkpoint_{STEP}", ck)
        overrides = EXTEND + ARMS[name]
        for attempt in (1, 2):
            print(f"== {name} (attempt {attempt}): resuming with {overrides}",
                  flush=True)
            try:
                metrics = run_arm(name, dst, overrides)
                print(f"== {name}: {metrics}", flush=True)
                break
            except Exception as e:
                print(f"== {name}: attempt {attempt} FAILED ({e})", flush=True)
                log = dst / "resume.log"
                if log.exists():
                    print(log.read_text()[-1500:], flush=True)

if __name__ == "__main__":
    main()
