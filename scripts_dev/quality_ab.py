"""Garden-scale quality A/B (VERDICT r3 item 3).

Protocol: only the FINAL m3_r3 checkpoint (step 12000) is committed, so
each arm resumes it and trains 2000 further steps (total_steps=14000)
under one kernel-knob override, evaluating at 13000/14000. A `control`
arm (no knob override) provides the comparison point: every arm shares
the identical start state, step budget, and schedule normalization, so
eval deltas isolate the knob. tile_size 16-vs-32 needs no training arm —
tests/test_rasterize_pallas.py::test_tile_size_parity proves outputs and
gradients match to tolerance, so it cannot diverge training.

Serial on the single chip; each arm gets its own workspace so the source
run's checkpoint stays untouched.
"""
import json
import shutil
import subprocess
import sys
from pathlib import Path

SRC = Path("/root/repo/runs/m3_r3")
STEP = 12000
EXTEND = ["trainer.total_steps=14000"]
ARMS = {
    "control": [],
    "pack_off": ["trainer.grad_bf16_pack=false"],
    "bwd_scan_bf16": ["trainer.bwd_scan_bf16=true"],
    "fwd_scan_bf16": ["trainer.fwd_scan_bf16=true"],
    # merged arm (fits the round wall-clock): bwd_scan_bf16 is gradient-only
    # and already golden-gated at CPU scale, so a quality delta in this arm
    # attributes to the forward half
    "scan_bf16": ["trainer.bwd_scan_bf16=true", "trainer.fwd_scan_bf16=true"],
}

def main():
    names = sys.argv[1:] or list(ARMS)
    for name in names:
        dst = Path(f"/root/repo/runs/ab_{name}")
        if (dst / "result.json").exists():
            print(f"== {name}: already done"); continue
        dst.mkdir(parents=True, exist_ok=True)
        shutil.copy(SRC / "config.yaml", dst / "config.yaml")
        shutil.copy(SRC / "cameras.json", dst / "cameras.json")
        (dst / "checkpoint").mkdir(exist_ok=True)
        ck = dst / "checkpoint" / f"checkpoint_{STEP}"
        if not ck.exists():
            shutil.copytree(SRC / "checkpoint" / f"checkpoint_{STEP}", ck)
        overrides = EXTEND + ARMS[name]
        print(f"== {name}: resuming with {overrides}", flush=True)
        r = subprocess.run(
            [sys.executable, "-m",
             "splat_trainer_tpu.scripts.checkpoint_tools",
             str(dst), *overrides, "--step", str(STEP)],
            cwd="/root/repo", capture_output=True, text=True, timeout=4200)
        out = r.stdout
        (dst / "resume.log").write_text(out + "\n--- stderr ---\n" + r.stderr)
        # final JSON metrics block is the last {...} in stdout
        try:
            j = out[out.rindex("{"):]
            metrics = json.loads(j)
            (dst / "result.json").write_text(json.dumps(
                {"arm": name, "overrides": overrides, **metrics}, indent=2))
            print(f"== {name}: {metrics}", flush=True)
        except Exception as e:
            print(f"== {name}: FAILED to parse metrics ({e}); rc={r.returncode}",
                  flush=True)
            print(out[-2000:])

if __name__ == "__main__":
    main()
