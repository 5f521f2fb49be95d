"""Trainer configuration.

Capability equivalent of /root/reference/splat_trainer/trainer/config.py:
26-85 (TrainConfig, CloudInitConfig) with TPU-specific additions
(rasterizer capacity/backend knobs).
"""

from dataclasses import dataclass, field
from typing import Optional, Union

from splat_trainer_tpu.color_corrector import (
    BilateralCorrectorConfig, NilCorrectorConfig,
)
from splat_trainer_tpu.controller import DisabledConfig, MCMCConfig, TargetConfig
from splat_trainer_tpu.core.types import RasterConfig
from splat_trainer_tpu.models.mlp_scene import MLPSceneConfig
from splat_trainer_tpu.trainer.init import CloudInitConfig
from splat_trainer_tpu.trainer.view_selection import (
    BatchOverlapSamplerConfig, RandomSamplerConfig, TargetOverlapConfig,
)

ControllerConfig = Union[TargetConfig, MCMCConfig, DisabledConfig]
ViewSelectionConfig = Union[RandomSamplerConfig, BatchOverlapSamplerConfig,
                            TargetOverlapConfig]


@dataclass(frozen=True)
class TrainConfig:
    scene: MLPSceneConfig = field(default_factory=MLPSceneConfig)
    controller: ControllerConfig = field(default_factory=TargetConfig)
    view_selection: ViewSelectionConfig = field(default_factory=RandomSamplerConfig)
    cloud_init: CloudInitConfig = field(default_factory=CloudInitConfig)
    # per-image bilateral color correction inside the loss (SURVEY.md #32)
    color_corrector: Union[NilCorrectorConfig, BilateralCorrectorConfig] = field(
        default_factory=NilCorrectorConfig)

    # schedule
    total_steps: int = 10_000
    eval_steps: int = 1_000
    log_interval: int = 10
    target_points: int = 1_000_000

    # abort thresholds (reference trainer.py:592-653)
    min_step_rate: Optional[float] = None
    max_ssim_regression: float = 0.05

    # evaluation / logging
    num_logged_images: int = 8
    log_worst_images: int = 2
    log_details: bool = False
    log_images: bool = True
    vis_clusters: int = 1024
    # reference k-means runs 100 Lloyd iterations (cluster.py:150-180)
    vis_cluster_iters: int = 100

    # losses
    ssim_weight: float = 1.0
    mse_weight: float = 10.0
    l1_weight: float = 0.0
    ssim_levels: int = 3

    # renderer
    antialias: bool = False
    blur_cov: float = 0.3
    tile_size: int = 16
    max_instances: int = 1 << 21
    # compacted (post ellipse-cull) instance capacity; None = max_instances.
    # At garden scale the exact cull passes ~35-50% of AABB instances, so
    # half of max_instances is a safe default set by the YAML configs.
    max_render_instances: int | None = None
    chunk_size: int = 128
    raster_backend: str = "auto"
    # bf16-packed payload lanes in the backward's gid sort (see
    # RasterConfig.grad_bf16_pack; golden-gated, off switch for A/B)
    grad_bf16_pack: bool = True
    # backward saturation compaction (RasterConfig.max_sat_instances): the
    # backward's stream ops run only over each tile's forward-consumed
    # chunk prefix (bit-identical gradients; overflow counted + bucketed).
    # The capacity is a THIRD bucket dimension sized from measured
    # sat_demand; this flag enables it on the single-chip pallas path.
    saturation_cull: bool = True
    # basis-matmul kernel variants (see RasterConfig.kernel_basis).
    # Default False: on-chip A/B (PROFILE.md) measured the direct
    # elementwise VPU path faster at both tile sizes — the tall-skinny
    # (P,6)x(6,K) basis contraction doesn't pay on the MXU.
    kernel_basis: bool = False
    # MXU moments contraction for the backward's gradient reductions
    # (RasterConfig.bwd_moments; measured -2.6 ms at garden scale)
    bwd_moments: bool = True
    # tiles composited per Pallas grid step (RasterConfig.tiles_per_block)
    tiles_per_block: int = 8
    # bf16 inputs to the kernels' MXU prefix-scan contractions
    # (RasterConfig.bwd_scan_bf16 / fwd_scan_bf16). Default ON since the
    # garden-scale quality A/B completed: runs/ab_scan_bf16 (both knobs,
    # 2k steps resumed from the m3_r3 final checkpoint) ended -0.043 dB
    # val PSNR vs runs/ab_control on the identical protocol — inside the
    # 0.15 dB gate — for a measured -46 ms/step at garden scale
    # (RESULTS.md round-4 section; bench.py applies the same gate).
    bwd_scan_bf16: bool = True
    fwd_scan_bf16: bool = True
    # pair-pack backward gradients inside the kernel (RasterConfig.
    # grad_pack_in_kernel; bitwise-identical to grad_bf16_pack's result)
    grad_pack_in_kernel: bool = False
    # per-band early exit inside the compositing kernels
    # (RasterConfig.exit_bands; 1 = whole-tile exit)
    exit_bands: int = 1
    # minimum peak alpha for a splat to be binned/composited
    # (RasterConfig.alpha_threshold). 1/255 is the 3DGS/reference
    # convention; the trained garden scene carries a large near-transparent
    # population (measured at checkpoint_30000: 2/255 drops 25% of visible
    # splats and 31% of instance demand), so raising it is a throughput
    # knob — approximation-class, so any non-default value must pass the
    # garden quality A/B (runs/ab_alpha*) before bench adoption.
    alpha_threshold: float = 1.0 / 255.0
    # per-band/tile exit threshold (RasterConfig.transmittance_threshold).
    # 1e-4 is the 3DGS-standard termination point; raising it trades a
    # bounded per-pixel color error for earlier exits — quality-A/B before
    # changing (runs/ab_* protocol)
    transmittance_threshold: float = 1e-4
    # binning prefix scans via the sequential-grid Pallas kernel
    # (RasterConfig.pallas_scans; exact — chip-qualified by
    # scripts_dev/qualify_scans.py before bench adopts it)
    pallas_scans: bool = False
    # re-jit the step at the smallest capacity ladder size fitting measured
    # instance demand (max_instances stays the ceiling). Binning/sort/
    # reduction costs scale with the STATIC sizes, so this is a large
    # steady-state win; each bucket costs one compile.
    instance_bucketing: bool = True

    # capacity headroom over target_points (static allocation)
    capacity_margin: float = 1.05

    # multi-chip data parallelism over cameras (SURVEY.md §2.4): replicated
    # scene, camera-sharded batches, psum'd gradients over ICI. The global
    # batch size must be a multiple of the mesh size (k images per chip).
    dp: bool = False
    dp_devices: Optional[int] = None  # None = all local devices

    # multi-chip POINT sharding for city-scale scenes (BASELINE.md config 5):
    # capacity-shaped state lives N/D per chip; one all_to_all per step
    # transposes (camera, shard) -> each chip composites one camera over the
    # full point set (parallel/points_parallel.py). batch_size must be a
    # multiple of the mesh size. Mutually exclusive with `dp`.
    pp: bool = False
    pp_devices: Optional[int] = None  # None = all local devices

    # output
    save_checkpoints: bool = False
    save_output: bool = True
    seed: int = 0

    def raster_config(self, render_median_depth: bool = False) -> RasterConfig:
        # Antialias keeps the low-pass blur and lets the projection's
        # compensation term rescale opacity (mip-splatting style). Zeroing
        # blur_cov here would make compensation exactly 1 and silently turn
        # antialias into a no-op that also removes the low-pass filter.
        return RasterConfig(
            tile_size=self.tile_size,
            blur_cov=self.blur_cov,
            antialias=self.antialias,
            max_instances=self.max_instances,
            max_render_instances=self.max_render_instances,
            chunk_size=self.chunk_size,
            backend=self.raster_backend,
            grad_bf16_pack=self.grad_bf16_pack,
            kernel_basis=self.kernel_basis,
            bwd_moments=self.bwd_moments,
            tiles_per_block=self.tiles_per_block,
            bwd_scan_bf16=self.bwd_scan_bf16,
            fwd_scan_bf16=self.fwd_scan_bf16,
            grad_pack_in_kernel=(self.grad_pack_in_kernel
                                 and self.grad_bf16_pack),
            pallas_scans=self.pallas_scans,
            alpha_threshold=self.alpha_threshold,
            exit_bands=self.exit_bands,
            transmittance_threshold=self.transmittance_threshold,
            render_median_depth=render_median_depth,
        )

    @property
    def capacity(self) -> int:
        from splat_trainer_tpu.utils.misc import next_multiple
        base = max(self.target_points,
                   self.cloud_init.initial_points or 0)
        return next_multiple(int(base * self.capacity_margin), 256)
