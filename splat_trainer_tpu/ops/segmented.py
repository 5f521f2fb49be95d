"""Scatter-free segmented reduction over contiguous index ranges.

TPU motivation: `jax.ops.segment_sum` lowers to an XLA scatter-add, which
TPUs execute poorly for millions of unsorted indices (the per-instance ->
per-gaussian reductions in the rasterizer backward move ~0.5 GB through a
serialized scatter). The binning stage (ops/tiling.py) generates instances
*contiguously per gaussian* in pre-sort order, so after one gather back to
that order, every gaussian's values occupy a contiguous range [start, end)
— and a segmented sum becomes prefix-sum differences: pure cumsum + gather,
no scatter anywhere.

Precision: a single f32 cumsum over ~8M values drifts to magnitudes where
prefix differences lose the segment (all-positive rows like visibility
reach ~1e6 while small segments are ~1e-2; eps * |prefix| swamps them).
Two levels fix it: in-block cumsums are magnitude-bounded by the block
length (f32 safe), and the across-block prefix runs in compensated
double-f32 arithmetic (TwoSum; ~2^-48 relative error — f64 itself is
unavailable on TPU without global x64 mode).
"""

import jax
import jax.numpy as jnp
from jax import lax


def _two_sum(a, b):
    """Knuth TwoSum: s + err == a + b exactly (f32 pair)."""
    s = a + b
    bb = s - a
    err = (a - (s - bb)) + (b - bb)
    return s, err


def _dd_add(x, y):
    """Double-f32 addition (hi, lo) + (hi, lo) -> (hi, lo)."""
    hx, lx = x
    hy, ly = y
    s, e = _two_sum(hx, hy)
    e = e + lx + ly
    hi, lo = _two_sum(s, e)
    return hi, lo


def segment_sum_contiguous(
    values: jax.Array,      # (M, R) f32 — per-instance rows
    starts: jax.Array,      # (N,) int32 — segment start in [0, M]
    ends: jax.Array,        # (N,) int32 — segment end in [0, M], end >= start
    block: int = 512,
    abutting: bool = False,
    compensated: bool = True,
) -> jax.Array:
    """Sum `values[starts[i]:ends[i]]` per segment -> (N, R) f32.

    Segments must be non-overlapping contiguous ranges (any order). Indices
    equal to M address the "total" prefix; empty segments return zeros.

    `abutting=True` asserts the caller's segments tile a prefix of the
    array back-to-back: starts[0] == 0 and starts[i] == ends[i-1] (the
    binning pipeline guarantees this — offsets are a cumsum). Then the
    prefix at each start is the previous segment's end prefix, and the
    boundary gather shrinks from 2N rows to N (TPU gathers pay ~25 ns per
    ROW — the dominant cost here — so this halves the reduction's gather).

    `compensated=False` keeps the IN-BLOCK prefixes plain f32 (the
    across-block level stays double-f32): the boundary gather — which pays
    per COLUMN on TPU (~1.2 ms per (600k,) column, measured) — then moves
    R columns instead of 2R. Error is bounded by eps * |in-block prefix|
    (<= eps * sum|values| over <=512 rows). Right for SIGNED, already-
    quantized summands (the bf16-packed gradient lanes: 0.4% per-instance
    quantization dwarfs the f32 prefix rounding); wrong for all-positive
    rows whose running prefix grows unboundedly (visibility — keep the
    default there).
    """
    m, r = values.shape
    block = min(block, m)
    while m % block:
        block //= 2
    nb = m // block

    # in-block inclusive prefix, compensated: a plain f32 cumsum rounds each
    # prefix to ulp(|prefix|), which swamps segments much smaller than their
    # in-block neighbors (e.g. visibility ~1e-2 after a ~1e4 prefix)
    vb = values.reshape(nb, block, r)
    if compensated:
        cin_hi, cin_lo = lax.associative_scan(
            _dd_add, (vb, jnp.zeros_like(vb)), axis=1)
        # exclusive = inclusive - element (dd)
        cex_hi, cex_lo = _dd_add((cin_hi, cin_lo), (-vb, jnp.zeros_like(vb)))
        # interleave (hi | lo) into one (M, 2R) matrix: TPU gathers cost ~8 ns
        # per INDEX regardless of modest row width, so one wide gather beats
        # two — and one gather over [ends; starts] beats two over each
        cex = jnp.concatenate(
            [cex_hi.reshape(m, r), cex_lo.reshape(m, r)], axis=1)  # (M, 2R)
        bsum_hi = cin_hi[:, -1, :]                     # (nb, R) block sums
        bsum_lo = cin_lo[:, -1, :]
    else:
        cin = jnp.cumsum(vb, axis=1)
        cex = (cin - vb).reshape(m, r)                 # (M, R)
        bsum_hi = cin[:, -1, :]
        bsum_lo = jnp.zeros_like(bsum_hi)

    # across-block exclusive prefix, also compensated
    hi, lo = lax.associative_scan(_dd_add, (bsum_hi, bsum_lo), axis=0)
    zero = jnp.zeros((1, r), values.dtype)
    bpre = jnp.concatenate([
        jnp.concatenate([zero, hi[:-1]], axis=0),
        jnp.concatenate([zero, lo[:-1]], axis=0)], axis=1)   # (nb, 2R)
    total = jnp.concatenate([hi[-1], lo[-1]])          # (2R,)

    n = starts.shape[0]
    idx = ends if abutting else jnp.concatenate([ends, starts])
    at_end = (idx >= m)[:, None]
    safe = jnp.minimum(idx, m - 1)
    # abutting ends are non-decreasing (prefix positions): the sorted-gather
    # hint is worth ~3x on TPU for the (N, 2R) boundary row gather
    # (measured 24 ms -> 8 ms at N=600k, R=10 — scripts_dev/
    # micro_gather_layout.py)
    base = jnp.where(at_end, total[None, :],
                     bpre.at[safe // block].get(
                         indices_are_sorted=abutting,
                         mode="promise_in_bounds"))
    inb = jnp.where(at_end, 0.0,
                    cex.at[safe].get(indices_are_sorted=abutting,
                                     mode="promise_in_bounds"))
    inb_lo = inb[:, r:] if compensated else jnp.zeros_like(inb[:, :r])
    p_hi, p_lo = _dd_add((base[:, :r], base[:, r:]), (inb[:, :r], inb_lo))

    if abutting:
        zero = jnp.zeros((1, r), values.dtype)
        s_hi = jnp.concatenate([zero, p_hi[:-1]], axis=0)
        s_lo = jnp.concatenate([zero, p_lo[:-1]], axis=0)
        dh, dl = _dd_add((p_hi, p_lo), (-s_hi, -s_lo))
    else:
        dh, dl = _dd_add((p_hi[:n], p_lo[:n]), (-p_hi[n:], -p_lo[n:]))
    return dh + dl
