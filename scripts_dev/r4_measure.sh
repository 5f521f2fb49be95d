#!/bin/bash
# Round-4 chip measurement window (run when the chip is free):
#  1. qualify the Pallas scan kernel lowering (writes runs/scan_qualification.json)
#  2. per-op VPU pass costs (f32 vs bf16, transcendentals)
#  3. fresh op-level trace of the full train step on the trained checkpoint
cd /root/repo
set -x
timeout 900 python -m scripts_dev.qualify_scans 2>&1 | tail -30
timeout 900 python -m scripts_dev.kernel_pass_micro 2>&1 | tail -25
timeout 1200 python scripts_dev/ab_step.py --trace --iters 20 2>&1 | tail -12
timeout 300 python scripts_dev/trace_ops.py /tmp/jaxtrace --top 45 2>&1 | tail -50
