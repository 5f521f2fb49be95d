"""Pallas TPU tile rasterizer: fused alpha-compositing forward + backward.

TPU-native replacement for taichi-splatting's CUDA tile rasterizer
(SURVEY.md N1/N2, §7.4 hard parts #1/#2). Architectural translation:

- CUDA's per-pixel serial front-to-back loop becomes a **blockwise
  associative composite**: each inner step processes a chunk of K
  depth-sorted instances against all P = tile_size^2 pixels at once, with
  pixels on sublanes and instances on lanes. Transmittance is a
  product-scan along the lane axis (Hillis-Steele), color accumulation is
  an MXU contraction — no scalar loop anywhere.
- Per-tile instance lists live in HBM as a **transposed (16, M) field
  matrix** (fields on sublanes, instances on lanes) so chunk DMA slices are
  lane-aligned (Mosaic requires 128-aligned slices on the minor dim).
- The kernel walks each tile's SORTED-space range through floor-aligned
  chunk windows with **double-buffered async DMA** (chunk i+1 prefetched
  during chunk i's compute), masking out-of-range lanes, and early-exits
  via `lax.while_loop` once every pixel in the tile saturates (the forward
  then key-drains the remaining windows — see _fwd_kernel).
- Per-instance outputs (visibility + gid key in fwd; parameter gradients +
  prune heuristic + gid key in bwd) are written chunk-by-chunk into each
  tile's EXCLUSIVE run of a compacted chunk-aligned output stream
  (ops/tiling.py out_starts / the renderer's consumed-prefix sat_starts),
  initialized by aliasing: all writes are pure double-buffered DMA and the
  grid executes tiles in **parallel** (`dimension_semantics = parallel` —
  both megacore TensorCores walk disjoint tile halves).
- Images are produced **tile-major** (num_tiles, 8, P): channels
  [r, g, b, T_final, median_ndc, unused...]. Conversion to (H, W, C) is a
  cheap XLA reshape outside the kernel (and outside the custom VJP, so the
  backward receives tile-major cotangents directly).

The backward replays the forward front-to-back per chunk and uses the
suffix-sum identity  S_k = C_final - prefix(w * c)  to form
dL/dalpha_k = T_k (c_k . g) - (S_k . g)/(1 - alpha_k) without a reverse
pass (same formulation as ops/rasterize_jnp.dense_backward, which is this
kernel's correctness oracle).
"""

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from splat_trainer_tpu.core.types import RasterConfig
from splat_trainer_tpu.ops.tiling import TileGrid

# packed per-instance field matrix, (16, M) f32 — rows:
# [0] mean_x [1] mean_y [2] conic_a [3] conic_b [4] conic_c
# [5] opacity [6:9] rgb [9] ndc depth [10:16] pad
INST_ROWS = 16
# backward per-instance gradient matrix, (16, M) f32 — rows:
# [0] d_mean_x [1] d_mean_y [2:5] d_conic [5] d_opacity [6:9] d_color
# [9] prune_cost [10] gid sort key [11:16] pad.
# With config.grad_pack_in_kernel the matrix is (8, M) instead: rows [0:5]
# carry bf16 pair-packed values ([dmx|dmy], [dca|dcb], [dcc|dop],
# [dcol_r|dcol_g], [dcol_b|prune]) as f32-bitcast u32, row [5] the key.
# GRAD_ROWS must stay a multiple of 8 (Mosaic requires HBM slices 8-aligned
# along the sublane dim); GRAD_USED marks the live rows — the backward
# reduction sorts/gathers ONLY those (dead payload lanes cost real
# milliseconds in the gid sort).
GRAD_ROWS = 16
GRAD_USED = 10
GRAD_PACKED = 5


def grad_rows(config: "RasterConfig") -> int:
    return 8 if config.grad_pack_in_kernel else GRAD_ROWS


def grad_key_row(config: "RasterConfig") -> int:
    return 5 if config.grad_pack_in_kernel else GRAD_KEY_ROW


def _rne_bf16_bits(x):
    """bf16 round-to-nearest-even of f32 lanes, result in the HIGH 16 bits
    (low 16 zero) — bit-identical to x.astype(bfloat16) for finite values,
    using only 32-bit integer ops (Mosaic-friendly; no u16 vectors)."""
    u = lax.bitcast_convert_type(x, jnp.uint32)
    return (u + jnp.uint32(0x7FFF) + ((u >> 16) & jnp.uint32(1))
            ) & jnp.uint32(0xFFFF0000)


def _pack_pair_inkernel(a, b):
    """Two f32 lanes -> one f32-bitcast u32 lane of [bf16(a) | bf16(b)]."""
    packed = _rne_bf16_bits(a) | (_rne_bf16_bits(b) >> 16)
    return lax.bitcast_convert_type(packed, jnp.float32)
# the kernels emit the reduction's sort key themselves — gaussian_id for
# in-range slots, the number of gaussians (past every real id) for padding
# — because the compacted output streams have no precomputed
# gaussian_id/valid arrays (f32 exact: ids < 2^24)
GRAD_KEY_ROW = 10
IMG_ROWS = 8  # [r, g, b, T_final, median_ndc, pad, pad, pad]


def _col_iota(p: int, k: int):
    return lax.broadcasted_iota(jnp.int32, (p, k), 1)


def _triu_strict(k: int):
    """Strictly-upper-triangular ones (K, K): exclusive-prefix matmul mask."""
    i = lax.broadcasted_iota(jnp.int32, (k, k), 0)
    j = lax.broadcasted_iota(jnp.int32, (k, k), 1)
    return (i < j).astype(jnp.float32)


def _cumsum_excl(x, u_strict):
    """Exclusive prefix sum along lanes as ONE MXU matmul: a Hillis-Steele
    scan costs log2(K) VPU passes over (P, K); x @ triu is a (P,K)x(K,K)
    contraction the MXU does in parallel with VPU work. When `u_strict` is
    bf16 the operand is quantized to match (f32 matmul costs several bf16
    MXU passes; accumulation stays f32 via preferred_element_type).
    bf16 operands need precision=DEFAULT explicitly: the package-level
    jax_default_matmul_precision="highest" would stamp an fp32 contract
    precision Mosaic rejects on bf16 inputs ("Bad lhs type")."""
    prec = (lax.Precision.DEFAULT if u_strict.dtype == jnp.bfloat16
            else None)
    return lax.dot_general(x.astype(u_strict.dtype), u_strict,
                           (((1,), (0,)), ((), ())),
                           precision=prec,
                           preferred_element_type=jnp.float32)


def _dot_f32acc(a, b, dims, bf16: bool):
    """dot_general with optional bf16 input quantization, f32 accumulation
    (precision=DEFAULT on the bf16 path — see _cumsum_excl)."""
    prec = None
    if bf16:
        a = a.astype(jnp.bfloat16)
        b = b.astype(jnp.bfloat16)
        prec = lax.Precision.DEFAULT
    return lax.dot_general(a, b, (dims, ((), ())), precision=prec,
                           preferred_element_type=jnp.float32)


def _shift_lanes_one_fill(x, d: int):
    """Shift (P, K) right by d lanes, filling with the product identity."""
    p = x.shape[0]
    return jnp.concatenate(
        [jnp.ones((p, d), jnp.float32), x[:, :-d]], axis=1)


def _cumprod_excl(om):
    """Exclusive prefix product along lanes (Hillis-Steele, log2(K) VPU
    multiply+shift passes) — the no-transcendental alternative to
    exp(cumsum(log1p(-alpha))) (RasterConfig.cumprod_scan)."""
    k = om.shape[1]
    x = _shift_lanes_one_fill(om, 1)
    d = 1
    while d < k:
        x = x * _shift_lanes_one_fill(x, d)
        d *= 2
    return x


def _chunk_geometry(data, px, py, start, end, off,
                    config: RasterConfig, k: int, op_row=None):
    """Shared fwd/bwd per-chunk alpha computation (elementwise path).

    data: (16, K) field rows; px/py: (P, 1) with INVALID pixels already
    pushed to the far-coordinate sentinel (_pixel_coords) — their power is
    hugely negative, so alpha masks itself without a (P, K) validity pass.
    The out-of-range lane mask is folded into the (1, K) opacity row for
    the same reason: every (P, K) boolean AND this used to chain is a full
    VPU pass over the chunk. `op_row` supplies a pre-folded opacity row
    (the banded kernels hoist it out of the per-band branches).
    Returns alpha (P, K) plus reusable intermediates.
    """
    mx, my = data[0:1, :], data[1:2, :]
    ca, cb, cc = data[2:3, :], data[3:4, :], data[4:5, :]

    if op_row is not None:
        op = op_row
    else:
        op = data[5:6, :]
        ids = off + lax.broadcasted_iota(jnp.int32, (1, k), 1)
        in_range = (ids >= start) & (ids < end)          # (1, K)
        op = jnp.where(in_range, op, 0.0)                # (1, K) fold

    dx = px - mx            # (P, K)
    dy = py - my
    power = -0.5 * (ca * dx * dx + cc * dy * dy) - cb * dx * dy
    expp = jnp.exp(power)
    alpha = jnp.minimum(op * expp, config.alpha_clamp)

    keep = (power <= 0.0) & (alpha >= config.alpha_threshold)
    alpha = jnp.where(keep, alpha, 0.0)
    return alpha, expp, dx, dy, (ca, cb, cc)


def _tile_basis(t, grid: TileGrid):
    """Per-tile pixel polynomial basis in TILE-LOCAL coordinates.

    Returns (basis (P, 6), cx, cy) with basis columns
    [1, qx, qy, qx^2, qx*qy, qy^2], qx = px - cx, cx the tile center —
    local coordinates keep every term O(tile_size) so the basis matmuls
    below lose no mantissa to cancellation.
    """
    ts = grid.tile_size
    p = ts * ts
    tx = t % grid.ntx
    ty = t // grid.ntx
    pix = lax.broadcasted_iota(jnp.int32, (p, 1), 0)
    half = 0.5 * ts
    cx = tx.astype(jnp.float32) * ts + half
    cy = ty.astype(jnp.float32) * ts + half
    qx = (pix % ts).astype(jnp.float32) + 0.5 - half      # (P, 1)
    qy = (pix // ts).astype(jnp.float32) + 0.5 - half
    one = jnp.ones((p, 1), jnp.float32)
    basis = jnp.concatenate(
        [one, qx, qy, qx * qx, qx * qy, qy * qy], axis=1)  # (P, 6)
    return basis, cx, cy


def _tile_basis_t(t, grid: TileGrid):
    """Transposed (6, P) pixel basis, built lane-major directly from iota
    (a (P, 1) -> (1, P) reshape would be a sublane->lane relayout)."""
    ts = grid.tile_size
    p = ts * ts
    half = 0.5 * ts
    pix = lax.broadcasted_iota(jnp.int32, (1, p), 1)
    qx = (pix % ts).astype(jnp.float32) + 0.5 - half      # (1, P)
    qy = (pix // ts).astype(jnp.float32) + 0.5 - half
    one = jnp.ones((1, p), jnp.float32)
    return jnp.concatenate(
        [one, qx, qy, qx * qx, qx * qy, qy * qy], axis=0)  # (6, P)


def _chunk_geometry_basis(data, basis, cx, cy, start, end, off, valid_px,
                          config: RasterConfig, k: int):
    """Per-chunk alpha with the conic quadratic as ONE MXU contraction.

    power(P, K) = basis(P, 6) @ coef(6, K): the per-instance coefficient
    rows fold the mean/conic into the polynomial (tile-local coordinates),
    so the whole (P, K) quadratic costs one matmul instead of ~9 VPU
    passes. `power <= eps` keeps the exact-path predicate under matmul
    roundoff (true power is always <= 0 for a PD conic).
    """
    mx, my = data[0:1, :], data[1:2, :]
    ca, cb, cc = data[2:3, :], data[3:4, :], data[4:5, :]
    op = data[5:6, :]

    mxq = mx - cx           # (1, K)
    myq = my - cy
    a0 = -0.5 * (ca * mxq * mxq + cc * myq * myq) - cb * mxq * myq
    a1 = ca * mxq + cb * myq
    a2 = cc * myq + cb * mxq
    coef = jnp.concatenate(
        [a0, a1, a2, -0.5 * ca, -cb, -0.5 * cc], axis=0)   # (6, K)
    power = lax.dot_general(basis, coef, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    expp = jnp.exp(power)
    alpha = jnp.minimum(op * expp, config.alpha_clamp)

    ids = off + lax.broadcasted_iota(jnp.int32, (1, k), 1)
    in_range = (ids >= start) & (ids < end)
    keep = ((power <= 1e-3) & (alpha >= config.alpha_threshold)
            & in_range & valid_px)
    alpha = jnp.where(keep, alpha, 0.0)
    return alpha, (mxq, myq, ca, cb, cc, op)


def _pixel_coords(t, grid: TileGrid, image_size):
    """Pixel centers of tile t as (P, 1) columns + validity mask.

    Invalid pixels (tile padding past the image edge) are pushed to a far
    coordinate sentinel: their conic power is hugely negative (or NaN for a
    degenerate conic — either way the keep-mask zeroes alpha), so the
    elementwise geometry path needs no per-pixel validity AND — one fewer
    (P, K) VPU pass per chunk. The mask is still returned for the basis
    path (whose matmul power has no such self-masking)."""
    p = grid.tile_size * grid.tile_size
    tx = t % grid.ntx
    ty = t // grid.ntx
    pix = lax.broadcasted_iota(jnp.int32, (p, 1), 0)
    ix = tx * grid.tile_size + pix % grid.tile_size
    iy = ty * grid.tile_size + pix // grid.tile_size
    w, h = image_size
    valid = (ix < w) & (iy < h)
    px = jnp.where(valid, ix.astype(jnp.float32) + 0.5, jnp.float32(1e9))
    py = jnp.where(valid, iy.astype(jnp.float32) + 0.5, jnp.float32(1e9))
    return px, py, valid


def _chunk_bounds(start, end, k: int):
    """First global-aligned chunk and chunk count for range [start, end)."""
    c0 = start // k
    nch = jnp.where(end > start, (end - c0 * k + k - 1) // k, 0)
    return c0, nch


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------


def _fwd_kernel(grid: TileGrid, image_size, config: RasterConfig, n_points,
                starts_ref, counts_ref, ostarts_ref, inst_ref, vis_zero_ref,
                out_ref, vis_ref,
                inst_buf, vis_buf, drain_buf, in_sem, vis_sem, drain_sem):
    del vis_zero_ref  # aliased to vis_ref
    k = config.chunk_size
    p = grid.tile_size * grid.tile_size
    G = config.tiles_per_block
    b = pl.program_id(0)
    u_strict = _triu_strict(k)
    if config.fwd_scan_bf16:
        u_strict = u_strict.astype(jnp.bfloat16)  # exact: entries are 0/1
    npf = jnp.float32(n_points)

    NB = config.exit_bands
    SB = p // NB

    def one_tile(g, t):
        # the instance stream is in SORTED order (ops/tiling.py): tile
        # ranges are NOT chunk-aligned; we read floor-aligned chunk windows
        # and mask out-of-range lanes (in_range below). Per-instance
        # OUTPUTS (visibility + its gid key) land in this tile's exclusive
        # chunk-aligned run of the compacted output stream, so the grid
        # still runs blocks of tiles in parallel with pure DMA writes.
        start = starts_ref[t]
        end = start + counts_ref[t]
        o0 = ostarts_ref[t] // k
        px, py, valid_px = _pixel_coords(t, grid, image_size)
        px_b = [px[b * SB:(b + 1) * SB] for b in range(NB)]
        py_b = [py[b * SB:(b + 1) * SB] for b in range(NB)]
        vpx_b = [valid_px[b * SB:(b + 1) * SB] for b in range(NB)]
        ones_s = jnp.ones((1, SB), jnp.float32)
        if config.kernel_basis:
            basis, bcx, bcy = _tile_basis(t, grid)
            basis_b = [basis[b * SB:(b + 1) * SB] for b in range(NB)]
        c0, nch = _chunk_bounds(start, end, k)

        def inst_copy(i, slot):
            off = (c0 + i) * k
            return pltpu.make_async_copy(
                inst_ref.at[:, pl.ds(off, k)], inst_buf.at[slot],
                in_sem.at[slot])

        def drain_copy(i, slot):
            # key-only reads: the 8-aligned upper half of the field matrix
            # (rows 8:16) contains the gaussian index (row 10)
            off = (c0 + i) * k
            return pltpu.make_async_copy(
                inst_ref.at[8:16, pl.ds(off, k)], drain_buf.at[slot],
                drain_sem.at[slot])

        @pl.when(nch > 0)
        def _():
            inst_copy(0, 0).start()

        def cond(carry):
            i, Ts, _rgb, _med = carry
            tmax = Ts[0] if NB == 1 else jnp.stack(
                [jnp.max(Tb) for Tb in Ts])
            return (i < nch) & (jnp.max(tmax)
                                > config.transmittance_threshold)

        def vis_copy(i, slot):
            off = (o0 + i) * k
            return pltpu.make_async_copy(
                vis_buf.at[slot], vis_ref.at[:, pl.ds(off, k)],
                vis_sem.at[slot])

        def key_row_of(gid_row, off):
            ids = off + lax.broadcasted_iota(jnp.int32, (1, k), 1)
            in_range = (ids >= start) & (ids < end)
            return jnp.where(in_range, gid_row, npf)

        def body(carry):
            i, Ts, rgbs, meds = carry
            off = (c0 + i) * k
            slot = lax.rem(i, 2)

            inst_copy(i, slot).wait()

            @pl.when(i + 1 < nch)
            def _():
                inst_copy(i + 1, 1 - slot).start()

            data = inst_buf[slot]
            col = data[6:9, :]                            # (3, K)
            # (1, K) opacity fold shared by every band
            ids = off + lax.broadcasted_iota(jnp.int32, (1, k), 1)
            in_range = (ids >= start) & (ids < end)
            op_row = jnp.where(in_range, data[5:6, :], 0.0)

            def band_step(b, Tb):
                """Composite one band's (S, K) slab; returns the band's
                updated transmittance + rgb/vis/median contributions."""
                if config.kernel_basis:
                    alpha, _rows = _chunk_geometry_basis(
                        data, basis_b[b], bcx, bcy, start, end, off,
                        vpx_b[b], config, k)
                else:
                    alpha, _expp, _dx, _dy, _con = _chunk_geometry(
                        data, px_b[b], py_b[b], start, end, off, config, k,
                        op_row=op_row)

                # transmittance prefix product: T_excl_j = T*prod_{i<j}(1-a)
                if config.cumprod_scan:
                    omf = 1.0 - alpha
                    T_excl = Tb * _cumprod_excl(omf)      # (S, K)
                    T_last = T_excl[:, k - 1:k] * omf[:, k - 1:k]
                else:
                    logom = jnp.log1p(-alpha)
                    cumlog_excl = _cumsum_excl(logom, u_strict)
                    T_excl = Tb * jnp.exp(cumlog_excl)    # (S, K)
                    T_last = Tb * jnp.exp(cumlog_excl[:, k - 1:k]
                                          + logom[:, k - 1:k])
                w = alpha * T_excl

                rgb_c = lax.dot_general(
                    col, w, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)   # (3, S)

                if config.render_median_depth:
                    # median-depth channel: only interactive/eval renders
                    T_incl = T_excl * (1.0 - alpha)
                    crossed = ((T_incl <= 0.5) & (T_excl > 0.5)
                               ).astype(jnp.float32)
                    med_c = lax.dot_general(
                        data[9:10, :], crossed, (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32)  # (1, S)
                else:
                    med_c = jnp.zeros((1, SB), jnp.float32)

                # per-band row sum rides the MXU ((1, S) x (S, K))
                vis_c = lax.dot_general(
                    ones_s, w, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)   # (1, K)
                return T_last, rgb_c, vis_c, med_c

            new_T, new_rgb, new_med = [], [], []
            vis_row = None
            for b in range(NB):
                if NB == 1:
                    T_last, rgb_c, vis_c, med_c = band_step(b, Ts[b])
                else:
                    # a DEAD band (max T at/below the exit threshold) skips
                    # its whole slab at runtime; dropped contributions are
                    # bounded by T <= threshold (same approximation class
                    # as the tile-level exit)
                    T_last, rgb_c, vis_c, med_c = lax.cond(
                        jnp.max(Ts[b]) > config.transmittance_threshold,
                        lambda Tb, b=b: band_step(b, Tb),
                        lambda Tb: (Tb, jnp.zeros((3, SB), jnp.float32),
                                    jnp.zeros((1, k), jnp.float32),
                                    jnp.zeros((1, SB), jnp.float32)),
                        Ts[b])
                new_T.append(T_last)
                new_rgb.append(rgbs[b] + rgb_c)
                new_med.append(meds[b] + med_c)
                vis_row = vis_c if vis_row is None else vis_row + vis_c

            # per-instance visibility + its gid sort key (field row 10):
            # pure double-buffered write into this tile's exclusive output
            # run. Wait for this slot's previous write (i-2) first.
            @pl.when(i >= 2)
            def _():
                vis_copy(i - 2, slot).wait()

            vis_buf[slot, 0:1] = vis_row
            vis_buf[slot, 1:2] = key_row_of(data[10:11, :], off)
            vis_copy(i, slot).start()

            return i + 1, tuple(new_T), tuple(new_rgb), tuple(new_med)

        T0 = tuple(jnp.ones((SB, 1), jnp.float32) for _ in range(NB))
        rgb0 = tuple(jnp.zeros((3, SB), jnp.float32) for _ in range(NB))
        med0 = tuple(jnp.zeros((1, SB), jnp.float32) for _ in range(NB))
        i_end, Ts, rgbs, meds = lax.while_loop(
            cond, body, (jnp.int32(0), T0, rgb0, med0))
        T = (Ts[0] if NB == 1
             else jnp.concatenate(list(Ts), axis=0))      # (P, 1)
        rgb = (rgbs[0] if NB == 1
               else jnp.concatenate(list(rgbs), axis=1))  # (3, P)
        med = (meds[0] if NB == 1
               else jnp.concatenate(list(meds), axis=1))  # (1, P)

        # discard the in-flight full prefetch if the loop exited early
        @pl.when(i_end < nch)
        def _():
            inst_copy(i_end, lax.rem(i_end, 2)).wait()

        # KEY DRAIN: chunks past the early-exit still own output slots, and
        # the gid-sort reduction needs every survivor's key present exactly
        # once (a missing key would shift its gaussian's whole segment).
        # Stream only the 8-row upper half per chunk and emit (vis=0, key)
        # — the visibility of an unconsumed instance is exactly 0, same as
        # the old zero-initialized aligned stream.
        @pl.when(i_end < nch)
        def _():
            drain_copy(i_end, lax.rem(i_end, 2)).start()

        def drain_body(i):
            slot = lax.rem(i, 2)
            drain_copy(i, slot).wait()

            @pl.when(i + 1 < nch)
            def _():
                drain_copy(i + 1, 1 - slot).start()

            @pl.when(i >= 2)
            def _():
                vis_copy(i - 2, slot).wait()

            vis_buf[slot, 0:1] = jnp.zeros((1, k), jnp.float32)
            vis_buf[slot, 1:2] = key_row_of(drain_buf[slot][2:3, :],
                                            (c0 + i) * k)
            vis_copy(i, slot).start()
            return i + 1

        lax.while_loop(lambda i: i < nch, drain_body, i_end)

        # wait the last two outstanding visibility writes — the scratch
        # buffers and semaphores are reused by the next tile in this block
        @pl.when(nch >= 2)
        def _():
            vis_copy(nch - 2, lax.rem(nch - 2, 2)).wait()

        @pl.when(nch >= 1)
        def _():
            vis_copy(nch - 1, lax.rem(nch - 1, 2)).wait()

        out_ref[g, 0:3, :] = rgb
        out_ref[g, 3:4, :] = T.reshape(1, p)
        out_ref[g, 4:5, :] = med
        # row 5 carries the CONSUMED CHUNK COUNT (early-exit point) of this
        # tile, broadcast across lanes — the saturation-compaction stream
        # (RasterConfig.max_sat_instances) is sized/laid out from it. f32 is
        # exact (chunk counts < 2^24). Rows 6-7 stay zero padding.
        out_ref[g, 5:6, :] = jnp.full((1, p), i_end.astype(jnp.float32))
        out_ref[g, 6:8, :] = jnp.zeros((2, p), jnp.float32)

    # statically unrolled: G tiles share one grid step's setup/teardown and
    # output-block DMA. Tail-block tiles past num_tiles are skipped (their
    # out rows carry garbage; the caller slices them off).
    for g in range(G):
        t = b * G + g
        if G == 1:
            one_tile(g, t)
        else:
            pl.when(t < grid.num_tiles)(lambda g=g, t=t: one_tile(g, t))


def rasterize_forward(tile_starts, tile_counts, out_starts, inst_data,
                      grid: TileGrid, image_size, config: RasterConfig,
                      n_points: int = 0, interpret: bool = False):
    """Run the forward kernel.

    Args:
        tile_starts: (num_tiles + 1,) int32 sorted-space range starts
            (NOT chunk-aligned — the kernel masks out-of-range lanes).
        tile_counts: (num_tiles,) int32 survivors per tile.
        out_starts: (num_tiles + 1,) int32 chunk-aligned starts of each
            tile's run in the compacted per-instance OUTPUT stream.
        inst_data: (16, Mr) f32 packed sorted instance field matrix.
        n_points: gaussian count — the past-every-gaussian padding key.
    Returns (tile_img (num_tiles, 8, P), vis_out (2, m_out)) where vis_out
    rows are [visibility, gid sort key] per output-stream slot (key =
    n_points for padding slots, including never-written capacity tail).
    """
    from splat_trainer_tpu.ops.tiling import out_capacity
    m_out = out_capacity(inst_data.shape[1], grid, config.chunk_size)
    p = grid.tile_size * grid.tile_size
    k = config.chunk_size
    G = config.tiles_per_block
    nb = -(-grid.num_tiles // G)

    kernel = functools.partial(_fwd_kernel, grid, image_size, config,
                               n_points)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),   # inst_data
            pl.BlockSpec(memory_space=pltpu.ANY),   # vis init (aliased)
        ],
        out_specs=[
            pl.BlockSpec((G, IMG_ROWS, p), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),   # vis out
        ],
        scratch_shapes=[
            pltpu.VMEM((2, INST_ROWS, k), jnp.float32),
            pltpu.VMEM((2, 2, k), jnp.float32),
            pltpu.VMEM((2, 8, k), jnp.float32),     # key-drain reads
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )

    # never-written slots (capacity tail) must carry the past-every-gaussian
    # padding key, not 0 (a zero key would alias gaussian 0 and shift every
    # reduction segment)
    vis_init = jnp.zeros((2, m_out), jnp.float32
                         ).at[1].set(float(n_points))
    tile_img, vis_out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((nb * G, IMG_ROWS, p), jnp.float32),
            jax.ShapeDtypeStruct((2, m_out), jnp.float32),
        ],
        input_output_aliases={4: 1},  # vis init (arg after scalar prefetch) -> vis out
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
        ),
        interpret=interpret,
    )(tile_starts, tile_counts, out_starts, inst_data, vis_init)
    if nb * G != grid.num_tiles:
        tile_img = tile_img[:grid.num_tiles]
    return tile_img, vis_out


# ---------------------------------------------------------------------------
# backward
# ---------------------------------------------------------------------------


def _bwd_kernel(grid: TileGrid, image_size, config: RasterConfig,
                n_points, *refs):
    # the backward READS the sorted instance stream through floor-aligned
    # chunk windows (masking out-of-range lanes) and WRITES gradient slabs
    # into its tile's exclusive run of the compacted output stream
    # (sat_starts) — counts arrive already truncated to the forward's
    # consumed prefix (and the stream capacity)
    (starts_ref, sat_starts_ref, counts_ref, inst_ref, ct_ref, img_ref,
     grad_zero_ref, grad_ref, inst_buf, grad_buf, in_sem, grad_sem) = refs
    del grad_zero_ref  # aliased to grad_ref
    k = config.chunk_size
    p = grid.tile_size * grid.tile_size
    Gt = config.tiles_per_block
    b = pl.program_id(0)
    u_strict = _triu_strict(k)
    bf16 = config.bwd_scan_bf16
    if bf16:
        u_strict = u_strict.astype(jnp.bfloat16)  # exact: entries are 0/1

    NB = config.exit_bands
    SB = p // NB

    def one_tile(bg, t):
        # chunk-aligned ranges: slabs exclusively owned, pure writes,
        # parallel grid over tile blocks
        start = starts_ref[t]
        end = start + counts_ref[t]
        c0_sat = sat_starts_ref[t] // k
        px, py, valid_px = _pixel_coords(t, grid, image_size)
        px_b = [px[b * SB:(b + 1) * SB] for b in range(NB)]
        py_b = [py[b * SB:(b + 1) * SB] for b in range(NB)]
        vpx_b = [valid_px[b * SB:(b + 1) * SB] for b in range(NB)]
        moments = config.kernel_basis or config.bwd_moments
        if config.kernel_basis:
            basis, bcx, bcy = _tile_basis(t, grid)
            basis_b = [basis[b * SB:(b + 1) * SB] for b in range(NB)]
        if moments:
            if not config.kernel_basis:
                _, bcx, bcy = _tile_basis(t, grid)
            basis_t = _tile_basis_t(t, grid)
            basis_t_b = [basis_t[:, b * SB:(b + 1) * SB] for b in range(NB)]
        c0, nch = _chunk_bounds(start, end, k)

        def inst_copy(i, slot):
            off = (c0 + i) * k
            return pltpu.make_async_copy(
                inst_ref.at[:, pl.ds(off, k)], inst_buf.at[slot],
                in_sem.at[slot])

        def grad_copy(i, slot):
            off = (c0_sat + i) * k
            return pltpu.make_async_copy(
                grad_buf.at[slot], grad_ref.at[:, pl.ds(off, k)],
                grad_sem.at[slot])

        @pl.when(nch > 0)
        def _():
            inst_copy(0, 0).start()

        g = ct_ref[bg, 0:3, :]                      # (3, P) image cotangent
        ct_T = ct_ref[bg, 3:4, :].reshape(p, 1)     # final-transmittance ct
        Cfin = img_ref[bg, 0:3, :]
        Tfin = img_ref[bg, 3:4, :].reshape(p, 1)
        # fold the final-transmittance cotangent into the suffix constant:
        # d_alpha = T_excl*cg - (F - prefix)/om - ct_T*Tfin/om
        #         = T_excl*cg - (F2 - prefix)/om   — ONE (P, K) division
        F2 = (jnp.sum(Cfin * g, axis=0, keepdims=True).reshape(p, 1)
              + ct_T * Tfin)
        gmag_row = jnp.sum(jnp.abs(g), axis=0, keepdims=True)       # (1, P)
        gmag = gmag_row.reshape(p, 1)
        if moments:
            gp = jnp.concatenate([g, gmag_row], axis=0)             # (4, P)
        g_b = [g[:, b * SB:(b + 1) * SB] for b in range(NB)]
        F2_b = [F2[b * SB:(b + 1) * SB] for b in range(NB)]
        gmag_b = [gmag[b * SB:(b + 1) * SB] for b in range(NB)]
        if moments:
            gp_b = [gp[:, b * SB:(b + 1) * SB] for b in range(NB)]

        def cond(carry):
            i, _Ts, _Ss = carry
            # the compacted stream's layout REQUIRES one key row per
            # consumed chunk (a skipped chunk would leave zero-keyed rows
            # that misalign every reduction segment) — and counts are
            # already truncated to the forward's early-exit point, so there
            # is nothing left for a T-threshold early exit to skip. Bands
            # that died earlier than the tile skip INSIDE the body.
            return i < nch

        def body(carry):
            i, Ts, Ss = carry
            off = (c0 + i) * k
            slot = lax.rem(i, 2)

            inst_copy(i, slot).wait()

            @pl.when(i + 1 < nch)
            def _():
                inst_copy(i + 1, 1 - slot).start()

            data = inst_buf[slot]
            col = data[6:9, :]                            # (3, K)
            ids = off + lax.broadcasted_iota(jnp.int32, (1, k), 1)
            in_range = (ids >= start) & (ids < end)
            op_row = jnp.where(in_range, data[5:6, :], 0.0)
            # per-instance rows the moment corrections need (shared)
            if moments:
                mxq_r = data[0:1, :] - bcx
                myq_r = data[1:2, :] - bcy
                op_r = data[5:6, :]
                ca, cb, cc = data[2:3, :], data[3:4, :], data[4:5, :]

            def zeros_contrib():
                if moments:
                    return (jnp.zeros((6, k), jnp.float32),
                            jnp.zeros((4, k), jnp.float32))
                return tuple(jnp.zeros((1, k), jnp.float32)
                             for _ in range(6)) + (
                    jnp.zeros((3, k), jnp.float32),
                    jnp.zeros((1, k), jnp.float32))

            def band_grad(b, Tb, Sb):
                """One band's (SB, K) backward slab -> (T_last, S_last,
                additive reduction contributions)."""
                if config.kernel_basis:
                    alpha, (mxq, myq, ca_, cb_, cc_, op_) = \
                        _chunk_geometry_basis(
                            data, basis_b[b], bcx, bcy, start, end, off,
                            vpx_b[b], config, k)
                else:
                    alpha, expp, dx, dy, (ca_, cb_, cc_) = _chunk_geometry(
                        data, px_b[b], py_b[b], start, end, off, config, k,
                        op_row=op_row)

                om = 1.0 - alpha
                if config.cumprod_scan:
                    T_excl = Tb * _cumprod_excl(om)
                    T_last = T_excl[:, k - 1:k] * om[:, k - 1:k]
                else:
                    logom = jnp.log1p(-alpha)
                    cumlog_excl = _cumsum_excl(logom, u_strict)
                    T_excl = Tb * jnp.exp(cumlog_excl)
                    T_last = Tb * jnp.exp(cumlog_excl[:, k - 1:k]
                                          + logom[:, k - 1:k])
                w = alpha * T_excl                        # (SB, K)

                cg = _dot_f32acc(g_b[b], col, ((0,), (0,)), bf16)
                wcg = w * cg
                # inclusive prefix on the MXU: exclusive + diagonal term
                prefix = Sb + _cumsum_excl(wcg, u_strict) + wcg
                Sg_after = F2_b[b] - prefix   # incl. dTfin/da_k = -Tfin/om

                safe_om = jnp.maximum(om, 1e-6)
                d_alpha = T_excl * cg - Sg_after / safe_om
                # dpow = d_alpha * alpha on the unclamped support;
                # alpha == 0 lanes self-mask through the product
                unclamped = alpha < config.alpha_clamp
                dpow = jnp.where(unclamped, d_alpha, 0.0) * alpha

                if moments:
                    # moments of dpow against this band's pixel basis; the
                    # (1, K) corrections happen ONCE after the band sum
                    m = _dot_f32acc(basis_t_b[b], dpow, ((1,), (0,)), bf16)
                    gw = _dot_f32acc(gp_b[b], w, ((1,), (0,)), bf16)
                    contrib = (m, gw)
                else:
                    Gm = jnp.where(alpha > 0.0, expp, 0.0)
                    d_al_u = jnp.where(unclamped, d_alpha, 0.0)
                    contrib = (
                        jnp.sum(d_al_u * Gm, axis=0, keepdims=True),
                        jnp.sum(dpow * (ca_ * dx + cb_ * dy), axis=0,
                                keepdims=True),
                        jnp.sum(dpow * (cc_ * dy + cb_ * dx), axis=0,
                                keepdims=True),
                        jnp.sum(-0.5 * dpow * dx * dx, axis=0,
                                keepdims=True),
                        jnp.sum(-dpow * dx * dy, axis=0, keepdims=True),
                        jnp.sum(-0.5 * dpow * dy * dy, axis=0,
                                keepdims=True),
                        _dot_f32acc(g_b[b], w, ((1,), (0,)), bf16),
                        jnp.sum(w * gmag_b[b], axis=0, keepdims=True),
                    )
                return T_last, prefix[:, k - 1:k], contrib

            new_T, new_S = [], []
            acc = None
            for b in range(NB):
                if NB == 1:
                    T_last, S_last, contrib = band_grad(b, Ts[b], Ss[b])
                else:
                    # band died in the forward at the same chunk (identical
                    # replayed T sequence + predicate): its instances have
                    # exactly zero gradient, so the skip is exact
                    T_last, S_last, contrib = lax.cond(
                        jnp.max(Ts[b]) > config.transmittance_threshold,
                        lambda Tb, Sb, b=b: band_grad(b, Tb, Sb),
                        lambda Tb, Sb: (Tb, Sb, zeros_contrib()),
                        Ts[b], Ss[b])
                new_T.append(T_last)
                new_S.append(S_last)
                acc = contrib if acc is None else jax.tree_util.tree_map(
                    lambda a, c: a + c, acc, contrib)

            if moments:
                # ALL position/conic gradient reductions from the summed
                # moments of dpow against the tile-local pixel polynomial
                # basis. With dx = qx - mxq (both tile-local):
                #   sum dpow*dx    = m_qx  - mxq*m_1
                #   sum dpow*dx^2  = m_qxx - 2 mxq m_qx + mxq^2 m_1  (etc.)
                # and d_opacity = m_1/op because dpow/op = d_al_u * expp on
                # the unclamped support.
                m, gw = acc
                mxq, myq, op = mxq_r, myq_r, op_r
                m1, mqx, mqy = m[0:1], m[1:2], m[2:3]
                mqxx, mqxy, mqyy = m[3:4], m[4:5], m[5:6]
                sdx = mqx - mxq * m1
                sdy = mqy - myq * m1
                sdxx = mqxx - 2.0 * mxq * mqx + mxq * mxq * m1
                sdxy = mqxy - mxq * mqy - myq * mqx + mxq * myq * m1
                sdyy = mqyy - 2.0 * myq * mqy + myq * myq * m1
                dmx = ca * sdx + cb * sdy
                dmy = cc * sdy + cb * sdx
                dca = -0.5 * sdxx
                dcb = -sdxy
                dcc = -0.5 * sdyy
                dop = m1 / jnp.maximum(op, 1e-12)
                dcol = gw[0:3]                                       # (3, K)
                prune = gw[3:4]
            else:
                # band_grad already produced each band's (1, K) reduction
                # partials (elementwise geometry path); the sum over bands
                # is the full-tile reduction
                (dop, dmx, dmy, dca, dcb, dcc, dcol, prune) = acc

            # pack the gradient slab; the slab is exclusively ours, so this
            # is a pure double-buffered write (wait for this slot's i-2
            # write first)
            @pl.when(i >= 2)
            def _():
                grad_copy(i - 2, slot).wait()

            # the gid sort key: gaussian id (packed row 10 of the
            # instance matrix) for in-range slots, n_points for padding
            key_row = jnp.where(in_range, data[10:11, :],
                                jnp.float32(n_points))
            if config.grad_pack_in_kernel:
                grad_buf[slot, 0:1, :] = _pack_pair_inkernel(dmx, dmy)
                grad_buf[slot, 1:2, :] = _pack_pair_inkernel(dca, dcb)
                grad_buf[slot, 2:3, :] = _pack_pair_inkernel(dcc, dop)
                grad_buf[slot, 3:4, :] = _pack_pair_inkernel(
                    dcol[0:1, :], dcol[1:2, :])
                grad_buf[slot, 4:5, :] = _pack_pair_inkernel(
                    dcol[2:3, :], prune)
                grad_buf[slot, 5:6, :] = key_row
                grad_buf[slot, 6:8, :] = jnp.zeros((2, k), jnp.float32)
            else:
                grad_buf[slot, 0:1, :] = dmx
                grad_buf[slot, 1:2, :] = dmy
                grad_buf[slot, 2:3, :] = dca
                grad_buf[slot, 3:4, :] = dcb
                grad_buf[slot, 4:5, :] = dcc
                grad_buf[slot, 5:6, :] = dop
                grad_buf[slot, 6:9, :] = dcol
                grad_buf[slot, 9:10, :] = prune
                grad_buf[slot, 10:11, :] = key_row
                grad_buf[slot, 11:16, :] = jnp.zeros((5, k), jnp.float32)
            grad_copy(i, slot).start()

            return i + 1, tuple(new_T), tuple(new_S)

        T0 = tuple(jnp.ones((SB, 1), jnp.float32) for _ in range(NB))
        S0 = tuple(jnp.zeros((SB, 1), jnp.float32) for _ in range(NB))
        i_end, _T, _S = lax.while_loop(cond, body, (jnp.int32(0), T0, S0))

        @pl.when(i_end < nch)
        def _():
            inst_copy(i_end, lax.rem(i_end, 2)).wait()

        @pl.when(i_end >= 2)
        def _():
            grad_copy(i_end - 2, lax.rem(i_end - 2, 2)).wait()

        @pl.when(i_end >= 1)
        def _():
            grad_copy(i_end - 1, lax.rem(i_end - 1, 2)).wait()

    for bg in range(Gt):
        t = b * Gt + bg
        if Gt == 1:
            one_tile(bg, t)
        else:
            pl.when(t < grid.num_tiles)(lambda bg=bg, t=t: one_tile(bg, t))


def rasterize_backward(tile_starts, tile_counts, sat_starts, inst_data,
                       ct_tile, tile_img, grid: TileGrid, image_size,
                       config: RasterConfig, m_out: int,
                       n_points: int = 0, interpret: bool = False):
    """Run the backward kernel.

    Args:
        tile_starts: (num_tiles + 1,) int32 sorted-space range starts.
        tile_counts: (num_tiles,) int32 per-tile counts ALREADY truncated to
            the forward's consumed prefix and the stream capacity.
        sat_starts: (num_tiles + 1,) int32 chunk-aligned starts of each
            tile's run in the compacted gradient output stream.
        m_out: static capacity of that stream.
    Returns per-instance gradients (GRAD_ROWS, m_out) with the gid sort key
    in row GRAD_KEY_ROW (n_points for padding slots)."""
    p = grid.tile_size * grid.tile_size
    k = config.chunk_size
    G = config.tiles_per_block
    nb = -(-grid.num_tiles // G)
    if nb * G != grid.num_tiles:
        pad = ((0, nb * G - grid.num_tiles), (0, 0), (0, 0))
        ct_tile = jnp.pad(ct_tile, pad)
        tile_img = jnp.pad(tile_img, pad)

    kernel = functools.partial(_bwd_kernel, grid, image_size, config,
                               n_points)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),   # inst_data
            pl.BlockSpec((G, 4, p), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),  # ct rows [rgb, dT]
            pl.BlockSpec((G, IMG_ROWS, p), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),  # fwd tile image
            pl.BlockSpec(memory_space=pltpu.ANY),   # grad init (aliased)
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, INST_ROWS, k), jnp.float32),
            pltpu.VMEM((2, grad_rows(config), k), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )

    # padding slots must carry the past-every-gaussian sort key, not 0
    # (a zero key would alias gaussian 0 and shift every reduction segment)
    grad_zero = jnp.zeros((grad_rows(config), m_out), jnp.float32
                          ).at[grad_key_row(config)].set(float(n_points))
    (inst_grad,) = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((grad_rows(config), m_out),
                                        jnp.float32)],
        input_output_aliases={6: 0},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
        ),
        interpret=interpret,
    )(tile_starts, sat_starts, tile_counts, inst_data, ct_tile, tile_img,
      grad_zero)
    return inst_grad


# ---------------------------------------------------------------------------
# tile-major <-> image layout helpers (outside the kernels, plain XLA)
# ---------------------------------------------------------------------------


def tiles_to_image(tile_img: jax.Array, grid: TileGrid, image_size) -> jax.Array:
    """(num_tiles, C, P) -> (H, W, C), cropping tile padding."""
    w, h = image_size
    ts = grid.tile_size
    c = tile_img.shape[1]
    x = tile_img.reshape(grid.nty, grid.ntx, c, ts, ts)
    x = x.transpose(0, 3, 1, 4, 2).reshape(grid.nty * ts, grid.ntx * ts, c)
    return x[:h, :w]


def image_to_tiles(img: jax.Array, grid: TileGrid) -> jax.Array:
    """(H, W, C) -> (num_tiles, C, P), zero-padding to tile multiples."""
    h, w, c = img.shape
    ts = grid.tile_size
    ph, pw = grid.nty * ts - h, grid.ntx * ts - w
    x = jnp.pad(img, ((0, ph), (0, pw), (0, 0)))
    x = x.reshape(grid.nty, ts, grid.ntx, ts, c)
    x = x.transpose(0, 2, 4, 1, 3).reshape(grid.num_tiles, c, ts * ts)
    return x
