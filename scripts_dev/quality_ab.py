"""Garden-scale quality A/B (VERDICT r3 item 3): resume m3_r3 from step
10000 and train the final 2000 steps under one kernel-knob override per
arm, comparing the step-12000 eval against the unmodified run's 27.00 dB
val / 29.75 val_cc. Serial on the single chip; each arm gets its own
workspace so the source run's checkpoints stay untouched."""
import json
import shutil
import subprocess
import sys
from pathlib import Path

SRC = Path("/root/repo/runs/m3_r3")
ARMS = {
    "pack_off": ["trainer.grad_bf16_pack=false"],
    "ts16": ["trainer.tile_size=16"],
    "bwd_scan_bf16": ["trainer.bwd_scan_bf16=true"],
    "fwd_scan_bf16": ["trainer.fwd_scan_bf16=true"],
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
        ck = dst / "checkpoint" / "checkpoint_10000"
        if not ck.exists():
            shutil.copytree(SRC / "checkpoint" / "checkpoint_10000", ck)
        print(f"== {name}: resuming with {ARMS[name]}", flush=True)
        r = subprocess.run(
            [sys.executable, "-m",
             "splat_trainer_tpu.scripts.checkpoint_tools",
             str(dst), *ARMS[name], "--step", "10000"],
            cwd="/root/repo", capture_output=True, text=True, timeout=4200)
        out = r.stdout
        (dst / "resume.log").write_text(out + "\n--- stderr ---\n" + r.stderr)
        # final JSON metrics block is the last {...} in stdout
        try:
            j = out[out.rindex("{"):]
            metrics = json.loads(j)
            (dst / "result.json").write_text(json.dumps(
                {"arm": name, "overrides": ARMS[name], **metrics}, indent=2))
            print(f"== {name}: {metrics}", flush=True)
        except Exception as e:
            print(f"== {name}: FAILED to parse metrics ({e}); rc={r.returncode}",
                  flush=True)
            print(out[-2000:])

if __name__ == "__main__":
    main()
