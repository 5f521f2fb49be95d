"""Tile binning for the rasterizer: static-capacity instance expansion + sort.

TPU-native replacement for the CUDA dynamic per-tile lists + radix sort used
by taichi-splatting (SURVEY.md §7.4 hard-part #1). Design:

- Each visible gaussian covers a rectangle of tiles; instance k of gaussian g
  is *derived by gather* (searchsorted over the exclusive-cumsum of spans)
  instead of scattered — fully parallel, no dynamic memory.
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


class Instances(NamedTuple):
    """Sorted (gaussian, tile) instance pairs, capacity-shaped (M,).

    The layout is **chunk-aligned**: every tile's range begins at a multiple
    of `RasterConfig.chunk_size`, with inert padding slots (valid=False)
    between tiles. Rasterizer chunks are therefore exclusively owned by one
    tile — per-instance output slabs never overlap across tiles, so the
    Pallas grid can execute tiles in parallel (megacore) with pure DMA
    writes and no boundary read-merge."""

    gaussian_id: jax.Array   # (M,) int32 — gaussian index per sorted instance
    tile_id: jax.Array       # (M,) int32 — tile index per sorted instance
    valid: jax.Array         # (M,) bool
    tile_starts: jax.Array   # (num_tiles + 1,) int32 — chunk-aligned range starts
    tile_counts: jax.Array   # (num_tiles,) int32 — real instances per tile
    total: jax.Array         # scalar int32 — number of valid instances (clipped)
    clipped: jax.Array       # scalar int32 — overflow count (0 if none)


def tile_rects(mean: jax.Array, radius: jax.Array, visible: jax.Array, grid: TileGrid):
    """Clipped tile-rectangle [x0, x1) x [y0, y1) per gaussian + span counts."""
    ts = grid.tile_size
    u, v = mean[:, 0], mean[:, 1]
    r = radius

    x0 = jnp.clip(jnp.floor((u - r) / ts), 0, grid.ntx).astype(jnp.int32)
    y0 = jnp.clip(jnp.floor((v - r) / ts), 0, grid.nty).astype(jnp.int32)
    x1 = jnp.clip(jnp.floor((u + r) / ts) + 1, 0, grid.ntx).astype(jnp.int32)
    y1 = jnp.clip(jnp.floor((v + r) / ts) + 1, 0, grid.nty).astype(jnp.int32)

    span = jnp.where(visible, (x1 - x0) * (y1 - y0), 0).astype(jnp.int32)
    return (x0, y0, x1, y1), span


def expand_and_sort(
    mean: jax.Array,
    radius: jax.Array,
    visible: jax.Array,
    depth_ndc: jax.Array,
    config: RasterConfig,
    grid: TileGrid,
) -> Instances:
    """Expand gaussians into depth-sorted per-tile instances (static capacity).

    Design choices here are measured on real TPU with the full training
    step as ground truth (micro-benchmarks through the remote-TPU tunnel
    mislead — see ops/sort.py): the ONE (M, 8) row-gather of per-gaussian
    fields beats five scalar (M,) gathers by ~25% end-to-end, and
    `lax.sort_key_val` on the packed (tile, depth) u32 key beats a
    hand-rolled cumsum/scatter radix sort by ~1.8x."""
    M = config.max_instances
    (x0, y0, x1, _y1), span = tile_rects(mean, radius, visible, grid)
    span_x = jnp.maximum(x1 - x0, 1)

    offsets = jnp.cumsum(span) - span              # exclusive cumsum, (N,)
    total_raw = offsets[-1] + span[-1]
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
    gid = jax.lax.cummax(seg_marks)

    # per-instance per-gaussian values from ONE row-gather of a packed
    # (N, 8) f32 matrix (all values are integers < 2^24, exact in f32)
    db = grid.depth_bits
    dq = jnp.minimum(jnp.clip(depth_ndc, 0.0, 1.0) * float((1 << db) - 1),
                     float((1 << db) - 1))
    aux_g = jnp.stack([
        offsets.astype(jnp.float32),
        span_x.astype(jnp.float32),
        x0.astype(jnp.float32),
        y0.astype(jnp.float32),
        dq,
        jnp.zeros_like(dq), jnp.zeros_like(dq), jnp.zeros_like(dq),
    ], axis=-1)                                      # (N, 8)
    aux = aux_g[gid]                                 # (M, 8) one row-gather
    offs_f, sx_f = aux[:, 0], aux[:, 1]
    x0_f, y0_f, dq_i = aux[:, 2], aux[:, 3], aux[:, 4]

    # instance -> tile within the gaussian's rect. Integer div/mod by a
    # runtime divisor has no native VPU op (~30ms/op at 2M); exact float
    # reciprocal with a +-1 fixup instead.
    r = inst.astype(jnp.float32) - offs_f
    ry = jnp.floor(r / sx_f)
    rx = r - ry * sx_f
    ry = jnp.where(rx < 0, ry - 1, jnp.where(rx >= sx_f, ry + 1, ry))
    rx = r - ry * sx_f

    # tile id and depth bits in exact f32, packed into the u32 sort key
    tile_f = (y0_f + ry) * grid.ntx + (x0_f + rx)
    key = (tile_f.astype(jnp.uint32) << db) | dq_i.astype(jnp.uint32)
    invalid_key = jnp.uint32(grid.num_tiles) << db
    key = jnp.where(valid, key, invalid_key)

    sorted_key, sorted_gid = jax.lax.sort_key_val(key, gid)

    # per-tile instance ranges via boundary search
    boundaries = (jnp.arange(grid.num_tiles + 1, dtype=jnp.uint32) << db)
    tile_starts = jnp.searchsorted(sorted_key, boundaries,
                                   side="left").astype(jnp.int32)
    sorted_tile = (sorted_key >> db).astype(jnp.int32)
    sorted_valid = sorted_tile < grid.num_tiles

    # --- chunk-align the layout (see Instances docstring) ------------------
    # Re-place each tile's run at a chunk_size-aligned start; slots that the
    # padding pushes past capacity M are dropped and counted. M must itself
    # be a chunk multiple so output slabs stay in-bounds.
    k = config.chunk_size
    if M % k != 0:
        raise ValueError(f"max_instances ({M}) must be a multiple of "
                         f"chunk_size ({k})")
    counts = tile_starts[1:] - tile_starts[:-1]                  # (T,)
    aligned_starts = jnp.minimum(
        jnp.concatenate([jnp.zeros((1,), jnp.int32),
                         jnp.cumsum(-(-counts // k) * k, dtype=jnp.int32)]),
        M)                                                       # (T+1,) K-aligned
    aligned_counts = jnp.minimum(aligned_starts[:-1] + counts, M
                                 ) - aligned_starts[:-1]         # (T,)

    t_of_i = jnp.minimum(sorted_tile, grid.num_tiles - 1)
    rank = inst - tile_starts[t_of_i]
    new_pos = aligned_starts[t_of_i] + rank
    keep = sorted_valid & (rank < aligned_counts[t_of_i])
    pos = jnp.where(keep, new_pos, M)                            # M = dropped
    gaussian_id = jnp.zeros((M,), jnp.int32).at[pos].set(sorted_gid, mode="drop")
    tile_id = jnp.full((M,), grid.num_tiles, jnp.int32).at[pos].set(
        sorted_tile, mode="drop")
    valid_p = jnp.zeros((M,), bool).at[pos].set(True, mode="drop")
    kept = jnp.sum(keep).astype(jnp.int32)

    return Instances(
        gaussian_id=gaussian_id,
        tile_id=tile_id,
        valid=valid_p,
        tile_starts=aligned_starts,
        tile_counts=aligned_counts,
        total=kept,
        clipped=clipped + (total - kept),
    )
