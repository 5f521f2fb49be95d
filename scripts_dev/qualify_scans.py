"""Qualify the Pallas scan kernel's Mosaic lowering on the real chip.

ops/scan_pallas.py is exact by construction (i32 values ride the MXU as
f32, totals < 2^24) and parity-tested in interpret mode, but the axon
backend has a record of miscompiling scan-shaped programs
(tiling._scan_guard) — so RasterConfig.pallas_scans stays off until this
script passes ON THE TARGET BACKEND: it compares the compiled kernel
against guarded-XLA scans on adversarial inputs (all sizes the binning
pipeline uses, zero/dense/sparse spans, descending ids), then times both.

Usage: python -m scripts_dev.qualify_scans
Exit code 0 = qualified (bench.py may adopt the knob).
"""
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

from splat_trainer_tpu.ops import scan_pallas
from splat_trainer_tpu.ops.tiling import _scan_guard

jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

SIZES = [600_000, 1 << 21, 2_883_584, 1 << 23]


def cases(m, rng, op):
    yield "zeros", np.zeros(m, np.int32)
    yield "ones", np.ones(m, np.int32)
    span_hi = max(2, min(9, ((1 << 24) - 1) // m))   # cumsum total < 2^24
    yield "spans", rng.integers(0, span_hi, m).astype(np.int32)
    sparse = np.zeros(m, np.int32)
    idx = rng.integers(0, m, m // 97)
    # keep cumsum TOTALS inside the documented f32-exact contract
    # (< 2^24): production cumsum operands are 0-1 cull/kept flags (total
    # <= capacity <= 2^23) and AABB spans whose prefix values past 2^24
    # only feed offsets that clamp to the drop slot (tiling.py) — raw
    # prefix parity is only promised below 2^24, so the test stays there.
    hi = 1000 if op == "add" else (1 << 20)
    sparse[idx] = rng.integers(1, hi, idx.shape[0]).astype(np.int32)
    if op == "add" and int(sparse.sum()) >= (1 << 24):
        sparse = (sparse * ((1 << 23) / sparse.sum())).astype(np.int32)
    yield "sparse", sparse
    if op == "max":
        # cummax-style: mostly zeros with occasional increasing marks
        marks = np.zeros(m, np.int32)
        pos = np.sort(rng.integers(0, m, m // 13))
        marks[pos] = np.arange(pos.shape[0], dtype=np.int32) % (1 << 20)
        yield "marks", marks


def main():
    print(f"backend: {jax.default_backend()}", flush=True)
    rng = np.random.default_rng(0)
    ok = True
    for m in SIZES:
        for op, kind, pfn, rfn in (
                ("cumsum", "add",
                 lambda a: scan_pallas._scan1d(a, "add", False),
                 lambda a: jnp.cumsum(_scan_guard(a))),
                ("cummax", "max",
                 lambda a: scan_pallas._scan1d(a, "max", False),
                 lambda a: jax.lax.cummax(_scan_guard(a)))):
            for name, x in cases(m, rng, kind):
                xj = jnp.asarray(x)
                got = np.asarray(jax.jit(pfn)(xj))
                want = np.asarray(jax.jit(rfn)(xj))
                bad = int((got != want).sum())
                if bad:
                    i = int(np.argmax(got != want))
                    print(f"FAIL {op} m={m} {name}: {bad} mismatches, "
                          f"first at {i}: got {got[i]} want {want[i]}",
                          flush=True)
                    ok = False
                else:
                    print(f"ok   {op} m={m} {name}", flush=True)

    # timing at the bench capacity (chained, donated would be ideal; a
    # simple block-until-ready loop is fine for a >2x verdict)
    m = 2_883_584
    x = jnp.asarray(rng.integers(0, 9, m).astype(np.int32))
    for op, pfn, rfn in (
            ("cumsum", lambda a: scan_pallas._scan1d(a, "add", False),
             lambda a: jnp.cumsum(_scan_guard(a))),
            ("cummax", lambda a: scan_pallas._scan1d(a, "max", False),
             lambda a: jax.lax.cummax(_scan_guard(a)))):
        for label, fn in (("pallas", pfn), ("xla", rfn)):
            f = jax.jit(fn)
            jax.block_until_ready(f(x))
            t0 = time.perf_counter()
            for _ in range(20):
                out = f(x)
            jax.block_until_ready(out)
            print(f"{op} {label}: {(time.perf_counter()-t0)/20*1e3:.3f} ms "
                  f"at m={m}", flush=True)

    # bench.py only lets auto-tune toggle pallas_scans when this record
    # says the compiled kernel matched guarded-XLA on this backend
    import json
    from pathlib import Path
    rec = {"qualified": ok, "backend": jax.default_backend(),
           "sizes": SIZES}
    Path("/root/repo/runs/scan_qualification.json").write_text(
        json.dumps(rec, indent=2))
    print("QUALIFIED" if ok else "NOT QUALIFIED", flush=True)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
