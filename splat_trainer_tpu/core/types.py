"""Core pytree types for the TPU splat trainer.

Design notes (TPU-first):
- All point arrays are **fixed-capacity** with an explicit validity story:
  invisible / inactive slots carry zeros and are masked out by the kernels.
  XLA requires static shapes; densification reuses capacity slots
  (see controller/) instead of reallocating tensors like the reference does
  (/root/reference/splat_trainer/scene/mlp_scene.py:301-313).
- `Gaussians3D` mirrors the reference's canonical splat struct
  (taichi_splatting Gaussians3D; see SURVEY.md N3) so ply IO and checkpoints
  stay layout-compatible.
- `CameraParams` mirrors taichi_splatting.perspective.CameraParams
  (SURVEY.md N4): T_camera_world 4x4, projection [fx fy cx cy],
  static image_size, near/far planes.
- `RasterConfig` mirrors taichi_splatting RasterConfig (SURVEY.md N5) and is
  a *static* (hashable) dataclass — it selects compiled kernel variants.
- `Rendering`/`RenderedPoints` mirror the reference's rich render output
  (SURVEY.md N2) with capacity-shaped per-point statistics.
"""

from dataclasses import dataclass
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from splat_trainer_tpu.utils import transforms


@struct.dataclass
class Gaussians3D:
    """Canonical 3D gaussian parameters (capacity-shaped).

    position:    (N, 3) world position
    rotation:    (N, 4) unit quaternion, xyzw
    log_scaling: (N, 3) log of per-axis scale
    alpha_logit: (N, 1) pre-sigmoid opacity
    feature:     (N, C) learned color feature, or (N, 3, K) SH coefficients
    """

    position: jax.Array
    rotation: jax.Array
    log_scaling: jax.Array
    alpha_logit: jax.Array
    feature: jax.Array

    @property
    def num_points(self) -> int:
        return self.position.shape[0]

    @property
    def batch_size(self) -> Tuple[int, ...]:
        return (self.position.shape[0],)

    def alpha(self) -> jax.Array:
        return jax.nn.sigmoid(self.alpha_logit)

    def scale(self) -> jax.Array:
        return jnp.exp(self.log_scaling)

    def translated(self, translation: jax.Array) -> "Gaussians3D":
        return self.replace(position=self.position + translation)

    def scaled(self, scale: float) -> "Gaussians3D":
        return self.replace(
            position=self.position * scale,
            log_scaling=self.log_scaling + jnp.log(scale),
        )

    @staticmethod
    def packed_dim(feature_dim: int) -> int:
        return 3 + 4 + 3 + 1 + feature_dim

    def __getitem__(self, idx) -> "Gaussians3D":
        return jax.tree_util.tree_map(lambda x: x[idx], self)


@struct.dataclass
class CameraParams:
    """Pinhole camera for rendering (taichi CameraParams equivalent).

    T_camera_world: (4, 4) world->camera rigid transform
    projection:     (4,)  [fx, fy, cx, cy]
    image_size:     (width, height) — static python ints (compiled shape)
    near_plane/far_plane: scalars (traced — varying them doesn't recompile)
    """

    T_camera_world: jax.Array
    projection: jax.Array
    near_plane: jax.Array
    far_plane: jax.Array
    image_size: Tuple[int, int] = struct.field(pytree_node=False)
    # For crop/slab cameras (shifted principal point rendering a sub-image
    # of a larger frame): the FULL frame's (width, height). The projection's
    # Jacobian frustum clamp must use the full extent — t*inv_z is
    # independent of cx/cy, so clamping against a tiny crop height distorts
    # covariances near the crop (utils/render_image.py, parallel/
    # image_parallel.py). None = image_size.
    clip_size: Optional[Tuple[int, int]] = struct.field(
        pytree_node=False, default=None)

    @property
    def camera_position(self) -> jax.Array:
        r, t = transforms.split_rt(self.T_camera_world)
        return -r.T @ t

    @property
    def T_world_camera(self) -> jax.Array:
        return transforms.invert_rt(self.T_camera_world)

    @staticmethod
    def create(T_camera_world, projection, image_size, near_plane=0.1, far_plane=100.0):
        return CameraParams(
            T_camera_world=jnp.asarray(T_camera_world, jnp.float32),
            projection=jnp.asarray(projection, jnp.float32),
            near_plane=jnp.asarray(near_plane, jnp.float32),
            far_plane=jnp.asarray(far_plane, jnp.float32),
            image_size=(int(image_size[0]), int(image_size[1])),
        )


@dataclass(frozen=True)
class RasterConfig:
    """Static rasterizer options — selects compiled kernel variants.

    Mirrors the options the reference pulls from kwargs
    (/root/reference/splat_trainer/scene/util.py:11-22, trainer.py:305-310).
    """

    tile_size: int = 16
    # low-pass filter added to the 2D covariance (pixel units)
    blur_cov: float = 0.3
    # if True, compensate opacity for the low-pass filter (Mip-style antialias)
    antialias: bool = False
    # compositing thresholds (match standard 3DGS semantics)
    alpha_threshold: float = 1.0 / 255.0
    alpha_clamp: float = 0.995
    transmittance_threshold: float = 1e-4
    # margin factor for clamping x/z, y/z in the projection Jacobian
    clip_margin: float = 1.3
    # produce a median-depth channel
    render_median_depth: bool = False
    compute_visibility: bool = True
    compute_point_heuristic: bool = True
    # static capacity for (gaussian, tile) instance pairs; overflow is
    # dropped and counted (never silent)
    max_instances: int = 1 << 20
    # capacity of the COMPACTED instance stream the compositing kernel
    # consumes. Expansion demand is AABB-rect based (max_instances bounds
    # it), but the exact ellipse-tile cull (ops/tiling.py) then discards
    # the majority of rect instances; packing/compositing/reduction all run
    # at this smaller static size. None = max_instances (no compaction).
    max_render_instances: Optional[int] = None
    # instances processed per inner kernel step
    chunk_size: int = 128
    # backend: "auto" | "pallas" | "jnp"
    backend: str = "auto"
    # per-instance -> per-gaussian reduction strategy:
    #   "gather"  — scatter-free prefix-diff over contiguous pre-sort
    #               segments (ops/segmented.py; TPU default — XLA
    #               scatter-add over millions of unsorted ids serializes)
    #   "segment" — jax.ops.segment_sum (scatter-add); kept for A/B
    reduce: str = "gather"
    # pack pairs of backward per-instance gradient lanes as bf16 halves of
    # one u32 sort payload (renderer._pack_grad_bf16): halves the dominant
    # gid-sort's payload lanes (measured ~0.8 ns/elem/lane at Ma on TPU).
    # Per-instance gradient values are quantized to bf16 (~0.4% relative)
    # BEFORE the f32 per-gaussian summation. Quality-gated ON by default:
    # tests/test_golden_quality.py runs the pinned 200-step trajectory with
    # this packing and holds the same ±0.4 dB band as the f32 path.
    grad_bf16_pack: bool = True
    # tiles composited per Pallas grid step (statically unrolled): amortizes
    # per-grid-step overhead (scalar loads, output-block DMA, loop
    # entry/exit) across G tiles — the kernels are latency-bound at ~3
    # chunks/tile median, not compute-bound. 1 = one tile per step.
    tiles_per_block: int = 1
    # evaluate the conic quadratic as ONE per-chunk MXU contraction of a
    # per-tile pixel polynomial basis (1, x, y, x^2, xy, y^2) against
    # per-instance coefficient rows, and reduce the backward's
    # position/conic gradients as ONE basis^T @ dpow moments contraction —
    # the kernels are VPU-bound on (P, K) elementwise passes while the MXU
    # idles, so both rewrites trade ~10-20 VPU passes for one matmul each.
    # Tile-local pixel coordinates keep the quadratic's terms O(tile_size)
    # (no catastrophic cancellation). False = the direct elementwise path
    # (kept for A/B and as the numeric oracle). Default False: on-chip
    # A/Bs (PROFILE.md) measured the elementwise path faster at both tile
    # sizes — the tall-skinny basis contraction doesn't pay on the MXU.
    kernel_basis: bool = False
    # SATURATION COMPACTION (backward): the forward kernel early-exits a
    # tile once every pixel's transmittance saturates, and reports how many
    # chunks it actually consumed. With this capacity set, the backward
    # writes its per-instance gradient slabs into a stream compacted to
    # exactly those consumed chunks, and the dominant backward stream ops
    # (the gid-keyed payload sort + segmented reduction) run at this much
    # smaller static size instead of max_render_instances. Lossless:
    # instances past saturation already get exactly zero gradient from the
    # early-exiting kernel; sums match to ~1 ulp (the compensated
    # reduction's block grouping depends on the static stream length —
    # tests/test_rasterize_pallas parity). Overflow (demand > capacity)
    # drops only the
    # overflowing tiles' gradients and is counted in clipped_instances;
    # the trainer buckets this capacity from the reported sat_demand like
    # the other two. None = off (backward streams at max_render_instances).
    max_sat_instances: Optional[int] = None
    # backward gradient reductions as ONE MXU moments contraction
    # (basis_t @ dpow, tile-local polynomial basis) while geometry stays on
    # the direct elementwise path: the six (P, K) -> (1, K) VPU
    # multiply+reduce chains (position/conic/opacity gradients) ride the
    # otherwise-idle MXU instead. Same math up to matmul association
    # (like kernel_basis, which switches geometry AND reductions together).
    bwd_moments: bool = False
    # transmittance prefix-product strategy inside the kernels:
    #   False — log-space: log1p + MXU triangular matmul + exp (two VPU
    #           transcendentals per chunk, scan itself rides the MXU)
    #   True  — direct Hillis-Steele lane cumprod (log2(K) VPU
    #           multiply+shift passes, no transcendentals)
    # Which wins depends on the VPU transcendental cost vs K — bench.py
    # A/Bs this knob on-chip. Products of (1 - alpha) in (0, 1] are
    # numerically benign either way (no cancellation).
    cumprod_scan: bool = False
    # quantize the BACKWARD kernel's MXU contraction inputs to bf16 (f32
    # accumulation via preferred_element_type): the two (P, K) x (K, K)
    # prefix-scan matmuls dominate the kernel's MXU FLOPs and an f32 matmul
    # costs several bf16 passes on the MXU. Affects gradients only (the
    # forward image is untouched); per-element ~0.4% relative quantization
    # BEFORE the cross-pixel reduction — strictly milder than the
    # per-instance grad_bf16_pack quantization already defaulted on.
    # Gate: test_bwd_scan_bf16_parity + the pinned golden trajectory.
    bwd_scan_bf16: bool = False
    # same for the FORWARD transmittance scan (log1p(-alpha) lanes in bf16,
    # f32 accumulation): touches the rendered image at ~0.4% of each
    # instance's transmittance contribution, so this one needs an at-scale
    # quality A/B before defaulting on (bench.py A/Bs it; golden-gated).
    fwd_scan_bf16: bool = False
    # PER-BAND early exit: split each tile's P pixels into this many
    # independently-exiting row bands inside the compositing kernels.
    # CUDA rasterizers terminate per PIXEL once transmittance saturates;
    # our SIMD chunk loop can only exit at the granularity it tracks
    # saturation, and with one band that is the WHOLE tile — the slowest
    # pixel (a silhouette crack, a sky lane) keeps all 1024 pixels
    # computing (measured: sat_demand ~= full stream on the trained
    # garden scene). With NB bands each (P/NB, K) slab skips its
    # geometry/scan/contraction work via lax.cond as soon as ITS max
    # transmittance drops below transmittance_threshold — the same
    # approximation class as the existing tile-level exit (dropped
    # contributions are bounded by T <= threshold), and the backward
    # replays the identical per-band predicate from its own recomputed
    # transmittance, so banded forward and backward stay exactly
    # consistent with no metadata channel. 1 = off (bit-identical to the
    # unbanded kernel); P/NB must be a positive multiple of 8 sublanes.
    exit_bands: int = 1
    # run the binning pipeline's four load-bearing 1D prefix scans (span
    # offsets, gid cummax fill, cull-survivor renumbering, kept-prefix
    # remap) through the sequential-grid Pallas scan kernel
    # (ops/scan_pallas.py) instead of XLA's logarithmic pass cascade
    # (~1-4 ms per scan at instance capacities). LOSSLESS: the kernel's
    # MXU f32 accumulation is exact below 2^24, which max_instances <= 2^23
    # guarantees (tests/test_scan_pallas.py parity). Default off until
    # bench.py qualifies the Mosaic lowering on the target backend; the
    # SPLAT_PALLAS_SCANS env var (1/0) overrides in either direction.
    pallas_scans: bool = False
    # perform grad_bf16_pack's pair-packing INSIDE the backward kernel
    # (manual round-to-nearest-even on u32 bits — bit-identical to the
    # outside astype(bf16) path): the gradient slab shrinks 16 -> 8 rows
    # (half the grad write DMA + half the zero-init stream) and the
    # outside pack passes before the gid sort disappear. Requires
    # grad_bf16_pack; no quality effect beyond it (same quantization
    # points, tested bitwise-equal).
    grad_pack_in_kernel: bool = False

    def __post_init__(self):
        assert self.exit_bands >= 1 and \
            (self.tile_size * self.tile_size) % self.exit_bands == 0 and \
            ((self.tile_size * self.tile_size) // self.exit_bands) % 8 == 0, \
            "exit_bands must divide tile_size^2 into >=8-row bands"
        assert self.max_instances % self.chunk_size == 0, \
            "max_instances must be a multiple of chunk_size"
        assert (self.max_sat_instances is None
                or self.max_sat_instances % self.chunk_size == 0), \
            "max_sat_instances must be a multiple of chunk_size"
        assert not (self.grad_pack_in_kernel and not self.grad_bf16_pack), \
            "grad_pack_in_kernel requires grad_bf16_pack"


@struct.dataclass
class Gaussians2D:
    """Projected (screen-space) gaussians, capacity-shaped.

    mean:    (N, 2) pixel coordinates
    conic:   (N, 3) upper-triangular inverse 2D covariance [a, b, c]
    depth:   (N,)   camera-space z
    opacity: (N,)   effective opacity after antialias compensation
    radius:  (N,)   3-sigma screen radius in pixels (float)
    screen_scale: (N, 2) sqrt eigenvalues of the 2D covariance (pixels)
    visible: (N,)   bool frustum/extent cull result
    """

    mean: jax.Array
    conic: jax.Array
    depth: jax.Array
    opacity: jax.Array
    radius: jax.Array
    screen_scale: jax.Array
    visible: jax.Array


@struct.dataclass
class RenderedPoints:
    """Per-point render statistics, capacity-shaped (SURVEY.md N2).

    Invisible points carry zeros. `idx`-style sparse access in the reference
    becomes mask-based access here (XLA static shapes).
    """

    in_view: jax.Array        # (N,) bool — point was in the view frustum
    visibility: jax.Array     # (N,) sum of compositing weights alpha*T
    prune_cost: jax.Array     # (N,) gradient-derived prune heuristic
    split_score: jax.Array    # (N,) gradient-derived split heuristic
    screen_scale: jax.Array   # (N, 2) screen-space sigma (pixels)
    depths: jax.Array         # (N,) camera z
    # settable per-point payload (reference: `rendering.points.attributes`,
    # mlp_scene.py:423 — e.g. the evaluated colors); attach with
    # `points.replace(attributes=x)`
    attributes: Optional[jax.Array] = None

    @property
    def num_visible(self) -> jax.Array:
        return (self.visibility > 0).sum()


@struct.dataclass
class Rendering:
    """Render output pytree (reference `Rendering`, SURVEY.md N2)."""

    image: jax.Array                     # (H, W, C)
    alpha: jax.Array                     # (H, W) accumulated opacity
    points: RenderedPoints
    camera: CameraParams
    median_ndc_image: Optional[jax.Array] = None   # (H, W) in [0,1]
    median_depth_image: Optional[jax.Array] = None  # (H, W) camera z
    # number of (gaussian, tile) instances dropped due to capacity overflow
    clipped_instances: Optional[jax.Array] = None
    # rendered (post ellipse-cull) instance count and uncapped AABB demand —
    # the trainer's capacity bucketing feeds on these
    num_instances: Optional[jax.Array] = None
    instance_demand: Optional[jax.Array] = None
    # chunk-aligned size of the backward saturation stream this view needs
    # (sum over tiles of forward-consumed chunks * chunk_size, uncapped) —
    # feeds the trainer's max_sat_instances bucketing
    sat_demand: Optional[jax.Array] = None

    @property
    def image_size(self):
        h, w = self.image.shape[:2]
        return (w, h)
