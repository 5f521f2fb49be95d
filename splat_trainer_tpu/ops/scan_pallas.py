"""1D inclusive scans (cumsum / cummax) as a sequential-grid Pallas kernel.

XLA lowers big 1D prefix scans on TPU to a logarithmic pass cascade —
measured ~1-4 ms each at the instance capacities (2-8M) the binning
pipeline scans at, with four load-bearing scans per step (span offsets,
gid cummax fill, cull-survivor renumbering, kept-prefix remap). This
kernel makes each scan ~bandwidth cost instead: a single sequential grid
walks (R, 128) blocks, scans each block in VMEM (lane prefix via one MXU
triangular matmul for sums / log2(128) shift-max passes for max, then row
offsets via a second tiny triangular matmul / sublane-shift cascade), and
chains blocks through a carry kept in SMEM.

It also sidesteps the axon-TPU prefix-scan miscompile that forced
`tiling._scan_guard`'s optimization barriers (tiling.py:56-71): the scan
here is explicit arithmetic, not an XLA reduce-window decomposition.

int32 inputs ride the MXU as f32 — exact while values and totals stay
below 2^24, which every binning scan satisfies (counts and ids are
bounded by the instance capacity). `cumsum`/`cummax` below check bounds
where they can and fall back to jnp on CPU (tests run the Pallas path in
interpret mode explicitly — tests/test_scan_pallas.py).
"""

import functools
import os

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
# block = ROWS x LANES elements. 256 is the qualified size: ROWS=512 and
# 1024 both HANG the axon remote compile helper (>15 min, no XLA output —
# the (ROWS, ROWS) triangular row-offset contraction is the suspect), while
# 256 compiles and passes the full qualification sweep
# (runs/scan_qualification.json; measured 1.4-1.6 ms vs XLA's 1.9-2.2 ms
# at 2.9M elements).
ROWS = int(os.environ.get("SPLAT_SCAN_ROWS", "256"))
BLOCK = ROWS * LANES


def _triu_incl_f32(k: int):
    i = lax.broadcasted_iota(jnp.int32, (k, k), 0)
    j = lax.broadcasted_iota(jnp.int32, (k, k), 1)
    return (i <= j).astype(jnp.float32)


def _tril_strict_f32(k: int):
    i = lax.broadcasted_iota(jnp.int32, (k, k), 0)
    j = lax.broadcasted_iota(jnp.int32, (k, k), 1)
    return (i > j).astype(jnp.float32)


def _shift_max(x, d: int, axis: int):
    """max(x, x shifted by +d along axis, -inf fill) with NO offset slices
    or concats (Mosaic rejects those inside kernels: "result/input offset
    mismatch on non-concat dimension") — a cyclic pltpu.roll plus an iota
    mask neutralizing the wrapped elements."""
    rolled = pltpu.roll(x, d, axis)
    idx = lax.broadcasted_iota(jnp.int32, x.shape, axis)
    return jnp.maximum(x, jnp.where(idx >= d, rolled, -jnp.inf))


def _scan_kernel(op: str, x_ref, o_ref, carry):
    b = pl.program_id(0)

    @pl.when(b == 0)
    def _():
        carry[0] = jnp.float32(0.0) if op == "add" else jnp.float32(-jnp.inf)

    x = x_ref[...].astype(jnp.float32)            # (R, LANES)
    if op == "add":
        # lane inclusive prefix on the MXU; row offsets via a second
        # strictly-lower triangular contraction of the (broadcast) row
        # totals. No slicing anywhere: totals come from a reduction and
        # the row-offset matmul keeps full lane width (every lane equal).
        lane = lax.dot_general(
            x, _triu_incl_f32(LANES), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        tot = jnp.sum(x, axis=1, keepdims=True)   # (R, 1)
        rows = lax.dot_general(
            _tril_strict_f32(ROWS), jnp.broadcast_to(tot, x.shape),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)   # (R, LANES), lanes equal
        out = lane + rows + carry[0]
        carry[0] = carry[0] + jnp.sum(tot)
    else:
        lane = x
        d = 1
        while d < LANES:                          # lane inclusive max-scan
            lane = _shift_max(lane, d, 1)
            d *= 2
        tot = jnp.max(x, axis=1, keepdims=True)   # (R, 1) row maxes
        rows = jnp.broadcast_to(tot, x.shape)
        d = 1
        while d < ROWS:                           # sublane inclusive scan
            rows = _shift_max(rows, d, 0)
            d *= 2
        # rows is the INCLUSIVE row-max prefix; the exclusive one is its
        # shift by one row
        rows_excl = pltpu.roll(rows, 1, 0)
        ridx = lax.broadcasted_iota(jnp.int32, x.shape, 0)
        rows_excl = jnp.where(ridx >= 1, rows_excl, -jnp.inf)
        out = jnp.maximum(jnp.maximum(lane, rows_excl), carry[0])
        carry[0] = jnp.maximum(carry[0], jnp.max(tot))
    o_ref[...] = out.astype(o_ref.dtype)


def _scan_blocks(x2d, op: str, interpret: bool):
    nb = x2d.shape[0] // ROWS
    return pl.pallas_call(
        functools.partial(_scan_kernel, op),
        grid=(nb,),
        in_specs=[pl.BlockSpec((ROWS, LANES), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((ROWS, LANES), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x2d.shape, x2d.dtype),
        scratch_shapes=[pltpu.SMEM((1,), jnp.float32)],
        interpret=interpret,
    )(x2d)


def _scan1d(x, op: str, interpret: bool):
    m = x.shape[0]
    pad = (-m) % BLOCK
    if op == "add":
        xp = jnp.pad(x, (0, pad))
    else:
        fill = (jnp.iinfo(x.dtype).min if jnp.issubdtype(x.dtype, jnp.integer)
                else -jnp.inf)
        xp = jnp.pad(x, (0, pad), constant_values=fill)
    out = _scan_blocks(xp.reshape(-1, LANES), op, interpret)
    return out.reshape(-1)[:m]


def _use_pallas(enable: bool | None) -> bool:
    # RasterConfig.pallas_scans selects the path; the SPLAT_PALLAS_SCANS
    # env var overrides in either direction (dev/qualification hook).
    # Never on CPU — interpret mode is the explicit test hook below.
    env = os.environ.get("SPLAT_PALLAS_SCANS")
    if env is not None:
        enable = env != "0"
    if not enable:
        return False
    return jax.default_backend() not in ("cpu",)


def cumsum(x: jax.Array, enable: bool | None = None) -> jax.Array:
    """Inclusive cumsum of a 1D i32/f32 array. Exact for i32 while the
    total stays < 2^24 (the MXU accumulates in f32) — all binning scans
    are bounded by the instance capacity, which the callers assert."""
    if not _use_pallas(enable):
        from splat_trainer_tpu.ops.tiling import _scan_guard
        return jnp.cumsum(_scan_guard(x))
    return _scan1d(x, "add", interpret=False).astype(x.dtype)


def cummax(x: jax.Array, enable: bool | None = None) -> jax.Array:
    """Inclusive cummax of a 1D i32/f32 array (i32 values must fit f32
    exactly, i.e. < 2^24 — ids are bounded by the point/tile counts)."""
    if not _use_pallas(enable):
        from splat_trainer_tpu.ops.tiling import _scan_guard
        return lax.cummax(_scan_guard(x))
    return _scan1d(x, "max", interpret=False).astype(x.dtype)


def cumsum_interpret(x: jax.Array) -> jax.Array:
    """Pallas path in interpret mode — test hook."""
    return _scan1d(x, "add", interpret=True).astype(x.dtype)


def cummax_interpret(x: jax.Array) -> jax.Array:
    return _scan1d(x, "max", interpret=True).astype(x.dtype)
