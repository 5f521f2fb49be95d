"""Chunk-size sweep on a trained checkpoint: full-train-step time vs
RasterConfig.chunk_size.

Hypothesis from PROFILE.md: the Pallas kernels' wall time is dominated by
fixed per-while-iteration overhead (scalar work, semaphore round-trips),
not by compute — the VPU/MXU work per chunk prices out at single-digit ms
for the whole frame. Bigger chunks amortize the overhead linearly at the
cost of chunk-alignment padding (ops/tiling.py) and coarser early exit.

Run on real TPU: python scripts_dev/chunk_sweep.py [--iters 15]
"""

import argparse
import dataclasses
import functools
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=15)
    p.add_argument("--chunks", type=int, nargs="+",
                   default=[128, 256, 512, 1024])
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    import bench as B
    from splat_trainer_tpu.controller.point_state import PointState
    from splat_trainer_tpu.trainer.train_step import (
        TrainBatch, make_hyper, train_step,
    )

    loaded = B.load_checkpoint_scene()
    scene0, cfg, camera_table = loaded if loaded else B.fallback_scene()
    w, h = camera_table.image_size if loaded else B.IMAGE_SIZE

    cams = camera_table.cameras
    n_cams = min(8, camera_table.num_images)
    key = jax.random.PRNGKey(0)
    batches = []
    for i in range(n_cams):
        batches.append(TrainBatch(
            images=(jax.random.uniform(jax.random.fold_in(key, i),
                                       (1, h, w, 3)) * 255).astype(jnp.uint8),
            image_idx=jnp.array([i]),
            T_camera_world=cams.camera_t_world[i][None],
            projection=cams.intrinsics[i][None],
            near=cams.depth_range[i, 0][None],
            far=cams.depth_range[i, 1][None]))

    hyper = make_hyper(cfg.scene, cfg, 0.5)

    for chunk in args.chunks:
      try:
        rcfg = dataclasses.replace(cfg.raster_config(), chunk_size=chunk)
        step = jax.jit(functools.partial(
            train_step, scene_config=cfg.scene, raster_config=rcfg,
            ssim_levels=3), donate_argnums=(0, 1))
        sc = jax.tree_util.tree_map(jnp.copy, scene0)
        ps = PointState.new_zeros(sc.capacity)
        sc, ps, m = step(sc, ps, batches[0], hyper, key)
        jax.block_until_ready(m.mse)
        t0 = time.perf_counter()
        for i in range(args.iters):
            sc, ps, m = step(sc, ps, batches[i % n_cams], hyper, key)
        jax.block_until_ready(m.mse)
        dt = (time.perf_counter() - t0) / args.iters
        print(f"chunk_size={chunk:5d}: full step {dt*1e3:8.2f} ms  "
              f"clipped={int(m.clipped_instances)}", flush=True)
      except Exception as e:  # e.g. VMEM overflow at large chunks
        print(f"chunk_size={chunk:5d}: FAILED ({type(e).__name__}: "
              f"{str(e)[:200]})", flush=True)


if __name__ == "__main__":
    main()
