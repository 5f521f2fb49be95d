"""Dev: capture a jax.profiler trace of N chained train steps at bench scale.

The op-level table this produces (via scripts_dev/trace_ops.py) has been the
decisive attribution tool of every perf round: per-phase wall-clock hides
which gather/sort/scatter dominates. Usage:

    python scripts_dev/trace_step.py [M] [Mr] [steps]
    python scripts_dev/trace_ops.py /tmp/jaxtrace_step --top 40

Capacities default to the current bench-bucketed sizes; pass explicit ones
to trace a different rung.
"""

import dataclasses
import functools
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

import bench
from splat_trainer_tpu.controller.point_state import PointState
from splat_trainer_tpu.trainer.train_step import TrainBatch, make_hyper, train_step


def main():
    m = int(sys.argv[1]) if len(sys.argv) > 1 else 4194304
    mr = int(sys.argv[2]) if len(sys.argv) > 2 else 3407872
    steps = int(sys.argv[3]) if len(sys.argv) > 3 else 5

    scene, cfg, camera_table = bench.load_checkpoint_scene()
    scene_config = cfg.scene
    rcfg = dataclasses.replace(cfg.raster_config(),
                               max_instances=m, max_render_instances=mr)
    # optional knob overrides so the trace matches the bench-adopted config
    import os
    for knob, cast in (("tile_size", int), ("tiles_per_block", int),
                       ("kernel_basis", lambda v: v == "1"),
                       ("cumprod_scan", lambda v: v == "1"),
                       ("grad_bf16_pack", lambda v: v == "1")):
        v = os.environ.get(f"TRACE_{knob.upper()}")
        if v is not None:
            rcfg = dataclasses.replace(rcfg, **{knob: cast(v)})
    pstate = PointState.new_zeros(scene.capacity)
    w, h = camera_table.image_size
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

    hyper = make_hyper(scene_config, cfg, 0.5)
    step = jax.jit(functools.partial(
        train_step, scene_config=scene_config, raster_config=rcfg,
        ssim_levels=3), donate_argnums=(0, 1))
    sc, ps = scene, pstate
    for i in range(3):
        sc, ps, mtr = step(sc, ps, batches[i % n_cams], hyper, key)
    jax.block_until_ready(mtr.mse)
    t0 = time.perf_counter()
    with jax.profiler.trace("/tmp/jaxtrace_step"):
        for i in range(steps):
            sc, ps, mtr = step(sc, ps, batches[(3 + i) % n_cams], hyper, key)
        jax.block_until_ready(mtr.mse)
    print(f"traced {steps} steps,",
          (time.perf_counter() - t0) / steps * 1e3, "ms/step")


if __name__ == "__main__":
    main()
