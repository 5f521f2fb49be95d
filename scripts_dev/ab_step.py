"""Dev: chained full-train-step A/B harness + XLA profiler capture.

The ONLY trustworthy timing protocol on the axon tunnel (see memory +
ops/sort.py): donated state carried step to step, rotating batches, one
block at the end. This harness loads the same checkpoint scene bench.py
uses and times the full step; `--trace` captures a profiler trace of the
chained loop for op-level attribution.

Usage:
  python scripts_dev/ab_step.py              # chained full-step timing
  python scripts_dev/ab_step.py --trace      # + jax.profiler trace
  python scripts_dev/ab_step.py --iters 30
"""

import argparse
import functools
import sys
import time

sys.path.insert(0, "/root/repo")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--trace", action="store_true")
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--trace-dir", default="/tmp/jaxtrace")
    ap.add_argument("--max-instances", type=int, default=0,
                    help="override raster max_instances (0 = config value)")
    ap.add_argument("--max-render", type=int, default=0,
                    help="override raster max_render_instances")
    ap.add_argument("--tile-size", type=int, default=0,
                    help="override raster tile_size (32 is the lossless "
                         "fewer-instances/bigger-blocks experiment)")
    ap.add_argument("--bf16-pack", action="store_true",
                    help="enable RasterConfig.grad_bf16_pack (halved "
                         "backward gid-sort payload lanes)")
    ap.add_argument("--tiles-per-block", type=int, default=0,
                    help="tiles composited per Pallas grid step (amortizes "
                         "per-grid-step overhead; try 4/8)")
    ap.add_argument("--bwd-moments", action="store_true",
                    help="MXU moments contraction for the backward's "
                         "gradient reductions (RasterConfig.bwd_moments)")
    ap.add_argument("--chunk-size", type=int, default=0,
                    help="instances per inner kernel step (multiple of 128)")
    ap.add_argument("--bands", type=int, default=0,
                    help="exit_bands (per-band early exit; 0 = config)")
    ap.add_argument("--pallas-scans", action="store_true",
                    help="enable RasterConfig.pallas_scans")
    ap.add_argument("--sat", type=int, default=0,
                    help="max_sat_instances (backward saturation "
                         "compaction capacity; 0 = off)")
    ap.add_argument("--fallback", action="store_true",
                    help="use bench.fallback_scene (BENCH_POINTS / "
                         "BENCH_IMAGE_SIZE env) instead of a checkpoint")
    ap.add_argument("--occupancy", action="store_true",
                    help="print post-cull instance counts and exit")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    import bench
    from splat_trainer_tpu.controller.point_state import PointState
    from splat_trainer_tpu.trainer.train_step import (
        TrainBatch, make_hyper, train_step,
    )

    if args.fallback:
        scene, cfg, camera_table = bench.fallback_scene()
    else:
        scene, cfg, camera_table = bench.load_checkpoint_scene()
    import dataclasses

    rcfg = cfg.raster_config()
    if args.max_instances:
        rcfg = dataclasses.replace(rcfg, max_instances=args.max_instances)
    if args.max_render:
        rcfg = dataclasses.replace(rcfg, max_render_instances=args.max_render)
    if args.tile_size:
        rcfg = dataclasses.replace(rcfg, tile_size=args.tile_size)
    if args.bf16_pack:
        rcfg = dataclasses.replace(rcfg, grad_bf16_pack=True)
    if args.tiles_per_block:
        rcfg = dataclasses.replace(rcfg, tiles_per_block=args.tiles_per_block)
    if args.bwd_moments:
        rcfg = dataclasses.replace(rcfg, bwd_moments=True)
    if args.chunk_size:
        rcfg = dataclasses.replace(rcfg, chunk_size=args.chunk_size)
    if args.sat:
        rcfg = dataclasses.replace(rcfg, max_sat_instances=args.sat)
    if args.bands:
        rcfg = dataclasses.replace(rcfg, exit_bands=args.bands)
    if args.pallas_scans:
        rcfg = dataclasses.replace(rcfg, pallas_scans=True)
    pstate = PointState.new_zeros(scene.capacity)
    w, h = (bench.IMAGE_SIZE if args.fallback else camera_table.image_size)

    cams = camera_table.cameras
    n_cams = min(8, camera_table.num_images)
    key = jax.random.PRNGKey(0)
    w0, h0 = camera_table.image_size
    scale = jnp.asarray([w / w0, h / h0, w / w0, h / h0])
    batches = []
    for i in range(n_cams):
        batches.append(TrainBatch(
            images=(jax.random.uniform(jax.random.fold_in(key, i),
                                       (1, h, w, 3)) * 255).astype(jnp.uint8),
            image_idx=jnp.array([i]),
            T_camera_world=cams.camera_t_world[i][None],
            projection=(cams.intrinsics[i] * scale)[None],
            near=cams.depth_range[i, 0][None],
            far=cams.depth_range[i, 1][None]))

    if args.occupancy:
        from splat_trainer_tpu.core.types import CameraParams
        from splat_trainer_tpu.ops import tiling
        from splat_trainer_tpu.ops.projection import ndc_depth, project_to_image

        def occ(batch):
            cam = CameraParams(
                T_camera_world=batch.T_camera_world[0],
                projection=batch.projection[0], near_plane=batch.near[0],
                far_plane=batch.far[0], image_size=(w, h))
            g2d = project_to_image(scene.gaussians(), cam, rcfg,
                                   active=scene.active)
            grid = tiling.make_tile_grid((w, h), rcfg.tile_size)
            inst = tiling.expand_and_sort(
                g2d.mean, jnp.where(g2d.visible, g2d.radius, 0.0),
                g2d.visible, ndc_depth(g2d.depth, cam.near_plane, cam.far_plane),
                rcfg, grid, conic=g2d.conic, opacity=g2d.opacity)
            return g2d.visible.sum(), inst.total, inst.clipped
        occ_jit = jax.jit(occ)
        for i in range(4):
            nv, ni, nc = occ_jit(batches[i])
            print(f"# cam {i}: visible {int(nv)}, post-cull instances "
                  f"{int(ni)}, clipped {int(nc)}")
        return

    hyper = make_hyper(cfg.scene, cfg, 0.5)
    step = jax.jit(functools.partial(
        train_step, scene_config=cfg.scene, raster_config=rcfg,
        ssim_levels=3), donate_argnums=(0, 1))

    sc, ps = scene, pstate
    t0 = time.perf_counter()
    sc, ps, m = step(sc, ps, batches[0], hyper, key)
    jax.block_until_ready(m.mse)
    print(f"# compile+first step: {time.perf_counter()-t0:.1f}s")
    # warm every batch's shapes (identical, but avoid first-use jitter)
    sc, ps, m = step(sc, ps, batches[1], hyper, key)
    jax.block_until_ready(m.mse)

    def run(iters):
        nonlocal sc, ps
        t0 = time.perf_counter()
        for i in range(iters):
            sc, ps, m = step(sc, ps, batches[i % n_cams], hyper, key)
        jax.block_until_ready(m.mse)
        return (time.perf_counter() - t0) / iters

    dt = run(args.iters)
    print(f"# chained full step: {dt*1e3:.2f} ms  ({1.0/dt:.2f} img/s)  "
          f"M={rcfg.max_instances}")
    print(f"# clipped_instances last step: {int(m.clipped_instances)}")
    print(f"# sat_demand last step: {int(getattr(m, 'sat_demand', 0))}  "
          f"instances {int(m.num_instances)}  demand {int(m.instance_demand)}")

    if args.trace:
        jax.profiler.start_trace(args.trace_dir)
        run(6)
        jax.profiler.stop_trace()
        print(f"# trace written to {args.trace_dir}")


if __name__ == "__main__":
    main()
