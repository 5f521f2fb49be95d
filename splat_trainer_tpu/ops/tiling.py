"""Tile binning for the rasterizer: static-capacity instance expansion + sort.

TPU-native replacement for the CUDA dynamic per-tile lists + radix sort used
by taichi-splatting (SURVEY.md §7.4 hard-part #1). Design:

- Each visible gaussian covers the exact bbox of its alpha>=threshold
  ellipse; instance k of gaussian g is *derived* (segment-start scatter +
  cummax over the exclusive-cumsum of spans) instead of list-appended —
  fully parallel, no dynamic memory.
- A single fused uint32 sort key packs (tile_id, quantized NDC depth):
  tile bits are the high bits so one `lax.sort_key_val` yields instances
  grouped by tile in front-to-back depth order. (A hand-rolled
  cumsum/scatter radix sort measured ~1.8x SLOWER in-step — ops/sort.py.)
- Static capacity `max_instances`; overflow instances are dropped and
  *counted* (Rendering.clipped_instances — never silent).

Depth is quantized to (32 - tile_bits) bits of inverse-depth NDC. At 1536
tiles that is 21 bits ≈ 2e-7 NDC resolution; ordering errors from ties are
visually indistinguishable (CUDA 3DGS similarly sorts quantized keys).
"""

import math
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from splat_trainer_tpu.core.types import RasterConfig
from splat_trainer_tpu.ops import scan_pallas


class TileGrid(NamedTuple):
    ntx: int
    nty: int
    tile_size: int

    @property
    def num_tiles(self) -> int:
        return self.ntx * self.nty

    @property
    def tile_bits(self) -> int:
        # enough bits to represent num_tiles (one past the last real tile is
        # the "invalid" bucket, so +1)
        return max(1, math.ceil(math.log2(self.num_tiles + 1)))

    @property
    def depth_bits(self) -> int:
        return 32 - self.tile_bits


def make_tile_grid(image_size: Tuple[int, int], tile_size: int) -> TileGrid:
    w, h = image_size
    return TileGrid(ntx=-(-w // tile_size), nty=-(-h // tile_size), tile_size=tile_size)


def _scan_guard(x: jax.Array) -> jax.Array:
    """Materialize a scan operand before cumsum/cummax.

    The axon TPU backend MISCOMPILES prefix scans whose operand is fused
    into a rich producer graph: `jnp.cumsum(span)` over ~630k int32 spans
    returned 5,410,301 where `jnp.sum(span)` of the identical operand in the
    same jit program returned the true 3,807,249 (measured 2026-08-17; CPU
    and a context-free chip run both agree with 3,807,249). Wrong offsets
    corrupt every downstream instance placement. An optimization_barrier on
    the operand forces it to materialize, which was verified to produce
    correct results in the failing context (as does associative_scan; plain
    and f32 cumsum both stay wrong). Every load-bearing scan in the binning
    pipeline goes through this guard; the cost is one (M,)-shaped
    materialization, ~0.04 ms at 2^23."""
    (x,) = jax.lax.optimization_barrier((x,))
    return x


class Instances(NamedTuple):
    """Depth-sorted (tile, depth)-keyed survivor stream, capacity Mr.

    The stream stays in **sorted order** — per-tile ranges
    [tile_starts[t], tile_starts[t] + tile_counts[t]) index it directly
    and are NOT chunk-aligned. The compositing kernels read each range
    through floor-aligned chunk windows and mask out-of-range lanes with
    the same `in_range` predicate they always applied per pixel, so the
    *input* stream needs no physical alignment at all. Alignment only
    matters for per-instance OUTPUT slabs (visibility in fwd, gradients
    in bwd), which land in their own compacted chunk-aligned layout:
    tile t's output run starts at `out_starts[t]`, and its i-th output
    chunk corresponds to sorted positions
    [k*(start//k + i), k*(start//k + i + 1)). Two adjacent tiles may read
    a shared straddled input window; each masks the other's lanes, so
    every survivor owns exactly ONE live output slot across the stream.

    The kernels emit each output slot's gaussian id as a key row (the id
    is already streamed to them as packed field row 10), which is what
    lets the per-gaussian reductions sort output slabs into compact
    (per-gaussian-contiguous) order with NO slot->gaussian gather: the
    rank of a live slot under a gid-keyed sort equals its compact
    position exactly (both orders enumerate the same survivor set grouped
    by gaussian), so `seg_start`/`seg_end` below index the sorted output
    stream directly. Random (M, k)-row gathers cost ~25 ns/row on TPU
    (each row read drags a full (8,128) tile) and even a monotonic (M,)
    element realign gather measured ~9 ms at 2.7M; sort payload lanes
    move the same data at ~0.8 ns/element — the sort IS the cheap
    permutation primitive on this hardware, and the kernel-emitted key
    removes the last slot->gaussian mapping the old aligned layout
    needed."""

    sorted_gid: jax.Array    # (Mr,) int32 — gaussian index per sorted slot
    tile_starts: jax.Array   # (num_tiles + 1,) int32 — sorted-space starts
    tile_counts: jax.Array   # (num_tiles,) int32 — survivors per tile
    out_starts: jax.Array    # (num_tiles + 1,) int32 — chunk-aligned starts
    #                          of each tile's per-instance OUTPUT run
    #                          (capacity out_capacity(Mr, grid, k))
    total: jax.Array         # scalar int32 — number of survivors
    clipped: jax.Array       # scalar int32 — overflow count (0 if none)
    demand: jax.Array        # scalar int32 — AABB expansion demand (uncapped;
    #                          drives the trainer's capacity bucketing)
    # scatter-free reduction support (ops/segmented.py):
    seg_start: jax.Array     # (N,) int32 — gaussian's compact range start
    seg_end: jax.Array       # (N,) int32 — gaussian's compact range end


def out_capacity(max_render_instances: int, grid: TileGrid,
                 chunk_size: int) -> int:
    """Static capacity of the per-instance OUTPUT stream: each nonempty
    tile's run covers ceil((end - k*floor(start/k)) / k) chunks, at most
    count + 2*(k-1) slots (head misalignment + tail padding), so the total
    is bounded by Mr + 2*T*k and no survivor can ever lose its slot."""
    return max_render_instances + 2 * grid.num_tiles * chunk_size


def tile_rects(mean: jax.Array, radius: jax.Array, visible: jax.Array,
               grid: TileGrid,
               conic: jax.Array | None = None,
               qmax: jax.Array | None = None):
    """Clipped tile-rectangle [x0, x1) x [y0, y1) per gaussian + span counts.

    With `conic` (a b c rows of the 2D precision) and `qmax` (the conic
    level the kernel's alpha threshold reaches), the rect is the EXACT
    axis-aligned bounding box of the alpha>=threshold ellipse:
    half-widths sqrt(qmax * Sigma_xx), sqrt(qmax * Sigma_yy) with
    Sigma = conic^-1 — strictly tighter than the circumscribed circle of
    radius sqrt(qmax * lambda_max) for anisotropic splats (the common
    case), which directly shrinks the instance-expansion demand and every
    capacity bucketed from it. Without conic the circle of `radius` is
    used (dense-oracle path)."""
    ts = grid.tile_size
    u, v = mean[:, 0], mean[:, 1]
    if conic is not None and qmax is not None:
        ca, cb, cc = conic[:, 0], conic[:, 1], conic[:, 2]
        det = jnp.maximum(ca * cc - cb * cb, 1e-12)
        q = jnp.maximum(qmax, 0.0)
        rx = jnp.minimum(jnp.sqrt(q * cc / det), radius)
        ry = jnp.minimum(jnp.sqrt(q * ca / det), radius)
    else:
        rx = ry = radius

    x0 = jnp.clip(jnp.floor((u - rx) / ts), 0, grid.ntx).astype(jnp.int32)
    y0 = jnp.clip(jnp.floor((v - ry) / ts), 0, grid.nty).astype(jnp.int32)
    x1 = jnp.clip(jnp.floor((u + rx) / ts) + 1, 0, grid.ntx).astype(jnp.int32)
    y1 = jnp.clip(jnp.floor((v + ry) / ts) + 1, 0, grid.nty).astype(jnp.int32)

    span = jnp.where(visible, (x1 - x0) * (y1 - y0), 0).astype(jnp.int32)
    return (x0, y0, x1, y1), span


def ellipse_tile_min_q(tx, ty, mx, my, ca, cb, cc, tile_size: int):
    """Exact min of the conic quadratic q(d) = a dx^2 + 2 b dx dy + c dy^2
    over a tile's pixel-center rectangle, d measured from the splat mean.

    Convexity (the conic is PD) makes the rect min exact & cheap: zero when
    the mean lies inside the rect, else the min over the four edges, each a
    1D quadratic minimized in closed form and clamped to the edge segment.
    """
    ts = float(tile_size)
    x0 = tx * ts + 0.5 - mx
    x1 = x0 + (ts - 1.0)
    y0 = ty * ts + 0.5 - my
    y1 = y0 + (ts - 1.0)

    def q(dx, dy):
        return ca * dx * dx + 2.0 * cb * dx * dy + cc * dy * dy

    def edge_x(x):   # fixed dx = x, minimize over dy in [y0, y1]
        dy = jnp.clip(-cb * x / jnp.maximum(cc, 1e-12), y0, y1)
        return q(x, dy)

    def edge_y(y):
        dx = jnp.clip(-cb * y / jnp.maximum(ca, 1e-12), x0, x1)
        return q(dx, y)

    inside = (x0 <= 0.0) & (0.0 <= x1) & (y0 <= 0.0) & (0.0 <= y1)
    edge_min = jnp.minimum(
        jnp.minimum(edge_x(x0), edge_x(x1)),
        jnp.minimum(edge_y(y0), edge_y(y1)))
    return jnp.where(inside, 0.0, edge_min)


def expand_and_sort(
    mean: jax.Array,
    radius: jax.Array,
    visible: jax.Array,
    depth_ndc: jax.Array,
    config: RasterConfig,
    grid: TileGrid,
    conic: jax.Array | None = None,
    opacity: jax.Array | None = None,
) -> Instances:
    """Expand gaussians into depth-sorted per-tile instances (static capacity).

    When `conic`/`opacity` are given, every AABB-rect instance additionally
    passes an EXACT ellipse-vs-tile test (alpha >= alpha_threshold reachable
    somewhere in the tile — the same predicate the compositing kernel
    applies per pixel, so culling is lossless). Surviving instances are
    *compacted* into `config.max_render_instances` slots: the packing
    gather, the compositing kernels, and the gradient reductions all run at
    the smaller size, while the AABB expansion/sort runs at
    `config.max_instances`.

    Design choices here are measured on real TPU with the full training
    step as ground truth (micro-benchmarks through the remote-TPU tunnel
    mislead — see ops/sort.py): the ONE (M, K) row-gather of per-gaussian
    fields beats per-field scalar gathers by ~25% end-to-end, and
    `lax.sort_key_val` on the packed (tile, depth) u32 key beats a
    hand-rolled cumsum/scatter radix sort by ~1.8x."""
    M = config.max_instances
    Mr = config.max_render_instances or M
    do_cull = conic is not None and opacity is not None
    qmax = None
    if do_cull:
        # q threshold: alpha = op * exp(-q/2) >= alpha_threshold
        qmax = 2.0 * jnp.log(
            jnp.maximum(opacity / config.alpha_threshold, 1e-12))
    (x0, y0, x1, _y1), span = tile_rects(mean, radius, visible, grid,
                                         conic=conic, qmax=qmax)
    span_x = jnp.maximum(x1 - x0, 1)

    # Pallas sequential-scan kernel (ops/scan_pallas.py) on TPU: XLA's
    # log-cascade scans cost ~1-4 ms each at instance capacities. f32
    # accumulation is exact below 2^24; prefixes past that are already
    # beyond any supported capacity (M <= 2^23 asserted below) and map to
    # the drop slot regardless.
    inc = scan_pallas.cumsum(span, enable=config.pallas_scans)
    offsets = inc - span                           # exclusive cumsum, (N,)
    total_raw = inc[-1]
    total = jnp.minimum(total_raw, M).astype(jnp.int32)
    clipped = (total_raw - total).astype(jnp.int32)

    inst = jnp.arange(M, dtype=jnp.int32)
    valid = inst < total

    # instance -> owning gaussian. A binary search (searchsorted) is ~50x
    # slower on TPU than this scatter + cummax: each visible gaussian writes
    # its id at its segment start; a running max broadcasts ids across
    # segments (starts are strictly increasing for span > 0).
    starts = jnp.where(span > 0, offsets, M)  # M = dropped by scatter
    seg_marks = jnp.zeros((M,), jnp.int32).at[starts].max(
        jnp.arange(span.shape[0], dtype=jnp.int32), mode="drop")
    gid = scan_pallas.cummax(seg_marks, enable=config.pallas_scans)

    # per-instance per-gaussian values from ONE row-gather of a packed
    # (N, K) f32 matrix (cols 0-4 are integers < 2^24, exact in f32)
    db = grid.depth_bits
    dq = jnp.minimum(jnp.clip(depth_ndc, 0.0, 1.0) * float((1 << db) - 1),
                     float((1 << db) - 1))
    cols = [
        offsets.astype(jnp.float32),
        span_x.astype(jnp.float32),
        x0.astype(jnp.float32),
        y0.astype(jnp.float32),
        dq,
    ]
    if do_cull:
        cols += [mean[:, 0], mean[:, 1],
                 conic[:, 0], conic[:, 1], conic[:, 2], qmax,
                 jnp.zeros_like(dq)]
    else:
        cols += [jnp.zeros_like(dq)] * 3
    aux_g = jnp.stack(cols, axis=-1)                 # (N, 8 or 12)
    # one row-gather; gid is non-decreasing (cummax) and always in-bounds
    aux = aux_g.at[gid].get(indices_are_sorted=True,
                            mode="promise_in_bounds")
    # force a PHYSICAL transposition: extracting columns from the row-major
    # (M, K) gather output makes XLA re-read the whole matrix per column
    # (12 full-array passes ~2 ms each, measured). A plain .T gets folded
    # into a zero-copy bitcast (measured: the 12 passes stay); reshaping
    # the transpose to 1D changes element order, which XLA cannot bitcast,
    # so one real copy materializes and every row below is a contiguous
    # (M,) stream. The optimization_barrier pins the materialization even
    # if a future compiler learns to re-fuse the transpose+reshape pair.
    ncol = aux.shape[1]
    aux_flat = aux.T.reshape(ncol * M)
    (aux_flat,) = jax.lax.optimization_barrier((aux_flat,))
    aux_cols = [aux_flat[i * M:(i + 1) * M] for i in range(ncol)]
    offs_f, sx_f = aux_cols[0], aux_cols[1]
    x0_f, y0_f, dq_i = aux_cols[2], aux_cols[3], aux_cols[4]

    # instance -> tile within the gaussian's rect. Integer div/mod by a
    # runtime divisor has no native VPU op (~30ms/op at 2M); exact float
    # reciprocal with a +-1 fixup instead.
    r = inst.astype(jnp.float32) - offs_f
    ry = jnp.floor(r / sx_f)
    rx = r - ry * sx_f
    ry = jnp.where(rx < 0, ry - 1, jnp.where(rx >= sx_f, ry + 1, ry))
    rx = r - ry * sx_f

    keep_inst = valid
    if do_cull:
        min_q = ellipse_tile_min_q(
            x0_f + rx, y0_f + ry, aux_cols[5], aux_cols[6],
            aux_cols[7], aux_cols[8], aux_cols[9], grid.tile_size)
        keep_inst = valid & (min_q <= aux_cols[10])

    # compacted pre-sort renumbering (reduction support): cull survivors
    # keep their relative pre-sort order under a dense renumbering, so
    # per-gaussian ranges REMAIN contiguous in the compacted space and the
    # reduction segments shrink from M to Mr. Survivors beyond Mr are
    # dropped from the RENDER stream too (not just the reduction space) —
    # rendering an instance that has no gradient slot would silently lose
    # its backward contribution.
    pass_incl = scan_pallas.cumsum(
        keep_inst.astype(jnp.int32), enable=config.pallas_scans)  # (M,) incl
    keep_inst = keep_inst & (pass_incl <= Mr)
    n_pass_raw = pass_incl[-1]                # pre-cap survivor count
    n_pass = jnp.minimum(n_pass_raw, Mr)      # post-cap survivor count

    # tile id and depth bits in exact f32, packed into the u32 sort key
    tile_f = (y0_f + ry) * grid.ntx + (x0_f + rx)
    key = (tile_f.astype(jnp.uint32) << db) | dq_i.astype(jnp.uint32)
    invalid_key = jnp.uint32(grid.num_tiles) << db
    key = jnp.where(keep_inst, key, invalid_key)

    # One 2-operand sort carries the packing permutation as a payload —
    # post-sort (M,) gathers cost ~8 ns/element on TPU, payload lanes in
    # the sort are far cheaper.
    sorted_key, sorted_gid = jax.lax.sort((key, gid), num_keys=1)

    # per-tile instance ranges via boundary search (tiny: T+1 queries).
    # Survivors beyond Mr were re-keyed invalid above, so every boundary
    # lands at or before n_pass <= Mr and the Mr-slice below loses nothing.
    boundaries = (jnp.arange(grid.num_tiles + 1, dtype=jnp.uint32) << db)
    tile_starts = jnp.searchsorted(sorted_key, boundaries,
                                   side="left").astype(jnp.int32)

    # --- sorted-direct stream + compacted OUTPUT layout --------------------
    # The instance stream keeps its sorted order (capacity Mr; NO aligned
    # re-placement, NO slot->gaussian realign gather — see the Instances
    # docstring). The kernels read each tile's range through floor-aligned
    # chunk windows; only their per-instance OUTPUTS get a chunk-aligned
    # compacted layout, whose per-tile starts are a (T,)-sized cumsum.
    k = config.chunk_size
    if M % k != 0 or Mr % k != 0:
        raise ValueError(f"max_instances ({M}) and max_render_instances "
                         f"({Mr}) must be multiples of chunk_size ({k})")
    if M > 1 << 23:
        raise ValueError(f"max_instances ({M}) above 2^23: the f32-exact "
                         "window of the Pallas scan kernel (shard points "
                         "across chips before growing past this)")
    counts = tile_starts[1:] - tile_starts[:-1]                  # (T,)
    c0 = tile_starts[:-1] // k                # first (floor) input chunk
    nch = jnp.where(counts > 0,
                    (tile_starts[1:] - c0 * k + k - 1) // k, 0)  # (T,) windows
    out_starts = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32),
         jnp.cumsum(_scan_guard(nch * k), dtype=jnp.int32)])     # (T+1,)

    # per-gaussian [start, end) in compact space: exclusive pass-prefix
    # evaluated at the gaussian's pre-sort segment bounds. Contiguity is
    # exact: seg_end[g] == seg_start[g+1] (offsets is a cumsum).
    pass_excl = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), pass_incl])     # (M+1,)
    seg_start = jnp.minimum(pass_excl.at[jnp.minimum(offsets, M)].get(
        indices_are_sorted=True, mode="promise_in_bounds"), Mr)
    seg_end = jnp.minimum(pass_excl.at[jnp.minimum(offsets + span, M)].get(
        indices_are_sorted=True, mode="promise_in_bounds"), Mr)

    return Instances(
        sorted_gid=sorted_gid[:Mr],
        tile_starts=tile_starts,
        tile_counts=counts,
        out_starts=out_starts,
        total=n_pass,
        clipped=clipped + (n_pass_raw - n_pass),
        demand=total_raw.astype(jnp.int32),
        seg_start=seg_start,
        seg_end=seg_end,
    )
