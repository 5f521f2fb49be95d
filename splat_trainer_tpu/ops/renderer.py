"""Public rendering API: project -> bin -> composite, with a custom VJP.

Equivalent of taichi-splatting's `project_to_image` / `render_projected` /
`render_gaussians` (SURVEY.md N1; usage mlp_scene.py:410-427). Two backends
behind one differentiable function:

- "pallas": tile-binned Pallas kernels (ops/rasterize_pallas.py) — the TPU
  production path (runs in interpret mode on CPU for tests).
- "dense":  the O(H*W*N) jnp oracle (ops/rasterize_jnp.py) — CPU/test path
  and the small-scene renderer for the virtual-device dryrun.

Both share one custom-VJP wrapper whose *backward additionally emits the
densification heuristics* (split_score = screen-space positional-gradient
norm, prune_cost = gradient-weighted contribution). The heuristics are
delivered as the cotangent of a zero-valued `heur_sink` input — a gradient
tap: `jax.grad(loss, argnums=heur_sink)` returns per-point heuristics
accumulated over the batch, exactly mirroring how the reference's renderer
computes them inside its CUDA backward (SURVEY.md N2).
"""

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax import lax

from splat_trainer_tpu.core.types import (
    CameraParams, Gaussians2D, Gaussians3D, RasterConfig, RenderedPoints, Rendering,
)
from splat_trainer_tpu.ops import rasterize_jnp, rasterize_pallas, tiling
from splat_trainer_tpu.ops.projection import inverse_ndc_depth, ndc_depth, project_to_image
from splat_trainer_tpu.ops.segmented import segment_sum_contiguous


class RasterOut(NamedTuple):
    image: jax.Array       # (H, W, 3)
    alpha: jax.Array       # (H, W)
    median_ndc: jax.Array  # (H, W)
    visibility: jax.Array  # (N,)
    clipped: jax.Array     # scalar int32
    instances: jax.Array   # scalar int32 — rendered (post-cull) instances
    demand: jax.Array      # scalar int32 — AABB expansion demand
    sat_demand: jax.Array  # scalar int32 — saturation-stream demand (0 = off)


def resolve_backend(config: RasterConfig) -> str:
    if config.backend != "auto":
        return config.backend
    return "pallas" if jax.default_backend() in ("tpu", "axon") else "dense"


def heuristic_scale(image_size) -> float:
    """Resolution normalization for split_score (3DGS convention: gradients
    measured relative to half the image extent)."""
    return 0.5 * max(image_size)


# ---------------------------------------------------------------------------
# custom-VJP rasterize functions (cached per static config)
# ---------------------------------------------------------------------------


def _compact_by_key(lanes, key):
    """Sort per-slot value lanes by a gid key into compact order -> (M, C).

    Rows [0, total) are exactly the compact pre-sort order (see
    tiling.Instances docstring)."""
    out = lax.sort((key,) + tuple(lanes), num_keys=1)
    return jnp.stack(out[1:], axis=-1)


def _pack_pair_bf16(a: jax.Array, b: jax.Array) -> jax.Array:
    """Two f32 lanes -> one u32 lane: bf16(a) in the high 16 bits, bf16(b)
    low. The pack/unpack passes are bandwidth-trivial next to the per-lane
    cost they remove from the gid sort (~0.8 ns/elem/lane at Ma)."""
    ah = lax.bitcast_convert_type(a.astype(jnp.bfloat16), jnp.uint16)
    bh = lax.bitcast_convert_type(b.astype(jnp.bfloat16), jnp.uint16)
    return (ah.astype(jnp.uint32) << 16) | bh.astype(jnp.uint32)


def _unpack_pair_bf16(p: jax.Array):
    a = lax.bitcast_convert_type((p >> 16).astype(jnp.uint16), jnp.bfloat16)
    b = lax.bitcast_convert_type(p.astype(jnp.uint16), jnp.bfloat16)
    return a.astype(jnp.float32), b.astype(jnp.float32)


def _compact_by_key_bf16(lanes, key):
    """`_compact_by_key` with pairs of lanes bf16-packed into u32 payloads
    (RasterConfig.grad_bf16_pack): an 11-operand sort becomes 6-operand.
    Values are quantized to bf16 per instance; the per-gaussian summation
    downstream stays f32."""
    if len(lanes) % 2:
        lanes = lanes + (jnp.zeros_like(lanes[0]),)
    packed = tuple(_pack_pair_bf16(lanes[i], lanes[i + 1])
                   for i in range(0, len(lanes), 2))
    out = lax.sort((key,) + packed, num_keys=1)
    cols = []
    for p in out[1:]:
        a, b = _unpack_pair_bf16(p)
        cols += [a, b]
    return jnp.stack(cols[:len(lanes)], axis=-1)


def _unpack_packed_rows(inst_grad_t):
    """Kernel-packed (GRAD_PACKED, M) f32-bitcast u32 pair rows -> (M, 10)
    f32 columns (RasterConfig.grad_pack_in_kernel)."""
    cols = []
    for i in range(rasterize_pallas.GRAD_PACKED):
        u = lax.bitcast_convert_type(inst_grad_t[i], jnp.uint32)
        a, b = _unpack_pair_bf16(u)
        cols += [a, b]
    return jnp.stack(cols, axis=-1)


def _compact_packed(lanes, key):
    """Sort kernel-packed pair payload lanes by gid key, then unpack:
    the quantization already happened inside the backward kernel
    (bit-identical to _pack_pair_bf16)."""
    out = lax.sort((key,) + tuple(lanes), num_keys=1)
    cols = []
    for p in out[1:]:
        a, b = _unpack_pair_bf16(lax.bitcast_convert_type(p, jnp.uint32))
        cols += [a, b]
    return jnp.stack(cols, axis=-1)


@functools.lru_cache(maxsize=None)
def _make_pallas_fn(grid: tiling.TileGrid, image_size, config: RasterConfig,
                    interpret: bool):
    hscale = heuristic_scale(image_size)

    def forward_parts(mean, conic, opacity, color, depth_ndc, radius):
        visible = radius >= 1.0
        inst = tiling.expand_and_sort(
            mean, radius, visible, depth_ndc, config, grid,
            conic=lax.stop_gradient(conic), opacity=lax.stop_gradient(opacity))
        n = mean.shape[0]
        # ONE contiguous row-gather (a 64-byte row costs the same HBM
        # transaction as a scalar) followed by a bandwidth-bound transpose —
        # per-field gathers are ~30x slower at 4M instances. Column 10 is
        # the gaussian index itself (an arange gathered by gid is gid):
        # both kernels emit their output streams' gid sort keys from it
        # (rasterize_pallas.GRAD_KEY_ROW / vis_out row 1).
        packed = jnp.concatenate([
            mean, conic, opacity[:, None], color, depth_ndc[:, None],
            jnp.arange(n, dtype=jnp.float32)[:, None],
            jnp.zeros((n, rasterize_pallas.INST_ROWS - 11), jnp.float32),
        ], axis=1)[inst.sorted_gid].T  # (16, Mr) field matrix

        tile_img, vis_out = rasterize_pallas.rasterize_forward(
            inst.tile_starts, inst.tile_counts, inst.out_starts, packed,
            grid, image_size, config, n_points=n, interpret=interpret)

        bundle = _reduction_bundle(inst, tile_img, n)
        vis_key = vis_out[1].astype(jnp.int32)

        if config.reduce == "segment":
            vis = jax.ops.segment_sum(
                jnp.where(vis_key < n, vis_out[0], 0.0),
                jnp.minimum(vis_key, n - 1), num_segments=n)
        else:
            # sort output-slot values into compact (per-gaussian
            # contiguous) order — the rank under a gid sort IS the compact
            # position (tiling.Instances docstring) — then prefix-diff over
            # the contiguous ranges; no scatter-add, no random row gathers
            # (ops/segmented.py). The kept flag (slot has a gradient slot
            # in the consumed-compacted backward stream) rides the same
            # sort; its compact-order prefix remaps the per-gaussian
            # reduction segments onto that stream.
            key_s, vis_s, kept_s = lax.sort(
                (vis_key, vis_out[0], bundle["kept"].astype(jnp.float32)),
                num_keys=1)
            del key_s
            vis = segment_sum_contiguous(
                vis_s[:, None], inst.seg_start, inst.seg_end,
                abutting=True)[:, 0]
            from splat_trainer_tpu.ops import scan_pallas
            kept_prefix = jnp.concatenate([
                jnp.zeros((1,), jnp.int32),
                scan_pallas.cumsum(kept_s.astype(jnp.int32),
                                   enable=config.pallas_scans)])
            bundle["seg_start"] = kept_prefix.at[inst.seg_start].get(
                indices_are_sorted=True, mode="promise_in_bounds")
            bundle["seg_end"] = kept_prefix.at[inst.seg_end].get(
                indices_are_sorted=True, mode="promise_in_bounds")
        del bundle["kept"]
        return tile_img, vis, inst, packed, bundle

    def _reduction_bundle(inst, tile_img, n):
        """Backward-stream layout from the forward's consumed counts.

        The forward kernel reports how many chunk windows each tile
        consumed before every pixel saturated (image row 5); gradient
        slabs for later instances are exactly zero (the backward's
        recursion reaches the identical early-exit), so the backward
        streams only the consumed prefix of each tile into a compacted
        stream of capacity `max_sat_instances` (defaults to the full
        output capacity = never clips). Overflow beyond an explicit
        capacity drops those tiles' gradients and is COUNTED."""
        k = config.chunk_size
        m_sat = config.max_sat_instances or tiling.out_capacity(
            inst.sorted_gid.shape[0], grid, k)
        used = tile_img[:, 5, 0].astype(jnp.int32)          # (T,) chunks
        starts = inst.tile_starts[:-1]
        c0 = starts // k
        head = starts - c0 * k
        # instances inside consumed windows (window 0 may start mid-chunk)
        consumed = jnp.clip(used * k - head, 0, inst.tile_counts)
        sat_unc = k * jnp.concatenate([
            jnp.zeros((1,), jnp.int32),
            jnp.cumsum(tiling._scan_guard(used))])          # (T+1,)
        sat_demand = sat_unc[-1]
        sat_starts = jnp.minimum(sat_unc, m_sat)
        avail = sat_starts[1:] - sat_starts[:-1]
        counts_bwd = jnp.minimum(consumed, avail)
        sat_clipped = jnp.sum(consumed) - jnp.sum(counts_bwd)

        # kept flag per forward OUTPUT slot: its sorted-stream index lies
        # in this tile's gradient range [start, start + counts_bwd) —
        # chunk-granularity scans + tiny (T,)-table gathers only
        m_out = tiling.out_capacity(inst.sorted_gid.shape[0], grid, k)
        C = m_out // k
        o0 = inst.out_starts[:-1] // k                      # (T,)
        cmark = jnp.where(inst.tile_counts > 0, o0, C)
        t_c = jax.lax.cummax(tiling._scan_guard(
            jnp.zeros((C,), jnp.int32).at[cmark].max(
                jnp.arange(grid.num_tiles, dtype=jnp.int32), mode="drop")))
        # source base of output chunk c: input window index is c - o0[t]
        base_c = (c0.at[t_c].get(mode="promise_in_bounds")
                  + jnp.arange(C, dtype=jnp.int32)
                  - o0.at[t_c].get(mode="promise_in_bounds")) * k   # (C,)
        lo_c = starts.at[t_c].get(mode="promise_in_bounds")
        hi_c = lo_c + counts_bwd.at[t_c].get(mode="promise_in_bounds")
        lane = jnp.arange(k, dtype=jnp.int32)
        g_idx = base_c[:, None] + lane[None, :]             # (C, k)
        kept2d = (g_idx >= lo_c[:, None]) & (g_idx < hi_c[:, None])
        return dict(sat_starts=sat_starts, counts_bwd=counts_bwd,
                    sat_demand=sat_demand, sat_clipped=sat_clipped,
                    m_sat=m_sat, kept=kept2d.reshape(m_out))

    def assemble(tile_img, vis, inst, sat_bundle):
        planes = rasterize_pallas.tiles_to_image(tile_img[:, :5], grid, image_size)
        image = planes[..., 0:3]
        alpha = 1.0 - planes[..., 3]
        median_ndc = jnp.where(alpha >= 0.5, planes[..., 4], 1.0)
        clipped = inst.clipped
        sat_demand = jnp.int32(0)
        clipped = clipped + sat_bundle["sat_clipped"]
        sat_demand = sat_bundle["sat_demand"]
        return RasterOut(image, alpha, median_ndc, vis, clipped,
                         inst.total, inst.demand, sat_demand)

    @jax.custom_vjp
    def f(mean, conic, opacity, color, depth_ndc, radius, heur_sink):
        del heur_sink
        tile_img, vis, inst, _, sat_bundle = forward_parts(
            mean, conic, opacity, color, depth_ndc, radius)
        return assemble(tile_img, vis, inst, sat_bundle)

    def f_fwd(mean, conic, opacity, color, depth_ndc, radius, heur_sink):
        del heur_sink
        tile_img, vis, inst, packed, sat_bundle = forward_parts(
            mean, conic, opacity, color, depth_ndc, radius)
        out = assemble(tile_img, vis, inst, sat_bundle)
        res = (packed, inst, tile_img, mean.shape[0], sat_bundle)
        return out, res

    def f_bwd(res, ct: RasterOut):
        packed, inst, tile_img, n, sat_bundle = res

        # map image-space cotangents back to tile-major rows [rgb, dT]
        ct_rgb = rasterize_pallas.image_to_tiles(ct.image, grid)          # (T,3,P)
        ct_T = rasterize_pallas.image_to_tiles(-ct.alpha[..., None], grid)  # (T,1,P)
        ct_tile = jnp.concatenate([ct_rgb, ct_T], axis=1)

        inst_grad_t = rasterize_pallas.rasterize_backward(
            inst.tile_starts, sat_bundle["counts_bwd"],
            sat_bundle["sat_starts"], packed, ct_tile, tile_img, grid,
            image_size, config, m_out=sat_bundle["m_sat"], n_points=n,
            interpret=interpret)  # (16, m_sat)
        key = inst_grad_t[rasterize_pallas.grad_key_row(config)
                          ].astype(jnp.int32)
        if config.reduce == "segment":
            if config.grad_pack_in_kernel:
                grad_cols = _unpack_packed_rows(inst_grad_t)
            else:
                grad_cols = inst_grad_t.T
            inst_grad = jnp.where((key < n)[:, None], grad_cols, 0.0)
            seg = jax.ops.segment_sum(inst_grad, jnp.minimum(key, n - 1),
                                      num_segments=n)
        else:
            # (M, 16)-row reorder gathers cost ~25 ns/row (each row drags
            # a full (8,128) HBM tile); payload lanes in one gid-keyed sort
            # move the same data ~2x cheaper and land directly in compact
            # order (rank == compact position, tiling.Instances docstring).
            # The kernel emitted the key itself and the whole sort runs at
            # the consumed-compacted capacity.
            seg_start = sat_bundle["seg_start"]
            seg_end = sat_bundle["seg_end"]
            if config.grad_pack_in_kernel:
                grad_sorted = _compact_packed(
                    tuple(inst_grad_t[i]
                          for i in range(rasterize_pallas.GRAD_PACKED)),
                    key)
            else:
                compact = (_compact_by_key_bf16 if config.grad_bf16_pack
                           else _compact_by_key)
                grad_sorted = compact(
                    tuple(inst_grad_t[i]
                          for i in range(rasterize_pallas.GRAD_USED)),
                    key)
            # bf16-packed lanes are already quantized at ~0.4% per
            # instance; the in-block f32 prefix rounding (<= eps * 512
            # rows) is noise next to it, and dropping the compensation
            # halves the per-COLUMN boundary gather (ops/segmented.py)
            seg = segment_sum_contiguous(
                grad_sorted, seg_start, seg_end, abutting=True,
                compensated=not config.grad_bf16_pack)

        d_mean = seg[:, 0:2]
        d_conic = seg[:, 2:5]
        d_opacity = seg[:, 5]
        d_color = seg[:, 6:9]
        prune_cost = seg[:, 9]
        split_score = jnp.linalg.norm(d_mean, axis=-1) * hscale
        heur = jnp.stack([split_score, prune_cost], axis=-1)

        zero = jnp.zeros_like(d_opacity)
        return (d_mean, d_conic, d_opacity, d_color, zero, zero, heur)

    f.defvjp(f_fwd, f_bwd)
    return f


@functools.lru_cache(maxsize=None)
def _make_dense_fn(grid: tiling.TileGrid, image_size, config: RasterConfig):
    hscale = heuristic_scale(image_size)

    def make_inputs(mean, conic, opacity, color, depth_ndc, radius):
        visible = radius >= 1.0
        order = jnp.argsort(jnp.where(visible, depth_ndc, jnp.inf))
        rect, _ = tiling.tile_rects(mean, radius, visible, grid)
        rect = jnp.stack(rect, axis=-1)
        inputs = rasterize_jnp.DenseInputs(
            mean=mean[order], conic=conic[order], opacity=opacity[order],
            color=color[order], depth_ndc=depth_ndc[order], rect=rect[order],
            visible=visible[order])
        return inputs, order

    @jax.custom_vjp
    def f(mean, conic, opacity, color, depth_ndc, radius, heur_sink):
        del heur_sink
        inputs, order = make_inputs(mean, conic, opacity, color, depth_ndc, radius)
        image, alpha, median_ndc, vis_sorted = rasterize_jnp.dense_forward(
            inputs, image_size, grid, config)
        vis = jnp.zeros_like(vis_sorted).at[order].set(vis_sorted)
        zero = jnp.int32(0)
        return RasterOut(image, alpha, median_ndc, vis, zero, zero, zero,
                         zero)

    def f_fwd(mean, conic, opacity, color, depth_ndc, radius, heur_sink):
        out = f(mean, conic, opacity, color, depth_ndc, radius, heur_sink)
        return out, (mean, conic, opacity, color, depth_ndc, radius)

    def f_bwd(res, ct: RasterOut):
        mean, conic, opacity, color, depth_ndc, radius = res
        inputs, order = make_inputs(mean, conic, opacity, color, depth_ndc, radius)
        dm, dc, do, dcol, split, prune = rasterize_jnp.dense_backward(
            inputs, image_size, grid, config, ct.image, ct.alpha)

        def unsort(x):
            return jnp.zeros_like(x).at[order].set(x)

        heur = jnp.stack([unsort(split) * hscale, unsort(prune)], axis=-1)
        zero = jnp.zeros_like(do)
        return (unsort(dm), unsort(dc), unsort(do), unsort(dcol), zero, zero, heur)

    f.defvjp(f_fwd, f_bwd)
    return f


# ---------------------------------------------------------------------------
# public API
# ---------------------------------------------------------------------------


def render_projected(
    g2d: Gaussians2D,
    colors: jax.Array,
    camera: CameraParams,
    config: RasterConfig,
    heur_sink: Optional[jax.Array] = None,
) -> Rendering:
    """Composite projected gaussians into a Rendering.

    `heur_sink` is an all-zeros (N, 2) array whose *gradient* carries the
    densification heuristics [split_score, prune_cost] (see module docstring).
    """
    backend = resolve_backend(config)
    grid = tiling.make_tile_grid(camera.image_size, config.tile_size)
    n = g2d.mean.shape[0]
    if heur_sink is None:
        heur_sink = jnp.zeros((n, 2), jnp.float32)

    depth_ndc = ndc_depth(g2d.depth, camera.near_plane, camera.far_plane)
    radius_masked = jnp.where(g2d.visible, g2d.radius, 0.0)

    if backend == "pallas":
        interpret = jax.default_backend() == "cpu"
        if not interpret and config.chunk_size % 128 != 0:
            # Mosaic requires HBM slices along the lane dimension to be
            # 128-aligned; interpret mode (CPU tests) accepts any size.
            raise ValueError(
                f"pallas backend on TPU needs chunk_size % 128 == 0, got "
                f"{config.chunk_size} (use the dense backend for tiny scenes)")
        fn = _make_pallas_fn(grid, camera.image_size, config, interpret)
    elif backend == "dense":
        fn = _make_dense_fn(grid, camera.image_size, config)
    else:
        raise ValueError(f"unknown rasterizer backend: {backend}")

    out = fn(g2d.mean, g2d.conic, g2d.opacity, colors[:, :3].astype(jnp.float32),
             depth_ndc, radius_masked, heur_sink)

    median_depth = None
    median_ndc = None
    if config.render_median_depth:
        median_ndc = out.median_ndc
        median_depth = inverse_ndc_depth(out.median_ndc, camera.near_plane,
                                         camera.far_plane)

    points = RenderedPoints(
        in_view=g2d.visible,
        visibility=jax.lax.stop_gradient(out.visibility),
        prune_cost=jnp.zeros((n,), jnp.float32),   # delivered via heur_sink grad
        split_score=jnp.zeros((n,), jnp.float32),  # delivered via heur_sink grad
        screen_scale=g2d.screen_scale,
        depths=g2d.depth,
    )
    return Rendering(
        image=out.image,
        alpha=out.alpha,
        points=points,
        camera=camera,
        median_ndc_image=median_ndc,
        median_depth_image=median_depth,
        clipped_instances=out.clipped,
        num_instances=out.instances,
        instance_demand=out.demand,
        sat_demand=out.sat_demand,
    )


def render_gaussians(
    gaussians: Gaussians3D,
    colors: jax.Array,
    camera: CameraParams,
    config: RasterConfig = RasterConfig(),
    active: Optional[jax.Array] = None,
    heur_sink: Optional[jax.Array] = None,
) -> Rendering:
    """Project + composite in one call (taichi `render_gaussians` equivalent)."""
    g2d = project_to_image(gaussians, camera, config, active=active)
    return render_projected(g2d, colors, camera, config, heur_sink=heur_sink)
