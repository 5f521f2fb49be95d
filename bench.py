"""Benchmark: full training step throughput on a garden-like synthetic scene.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline: taichi-splatting on A100 runs the Mip-NeRF-360 garden recipe
(1536x1024, ~1M gaussians mid-training) at roughly 12 images/sec
(BASELINE.md: no published numbers exist; this is the A100 figure the
driver's north-star ratio is taken against).
"""

import json
import time

import numpy as np

BASELINE_IMAGES_PER_SEC = 12.0


def main():
    import jax
    import jax.numpy as jnp

    from splat_trainer_tpu.controller.point_state import PointState
    from splat_trainer_tpu.core.types import Gaussians3D, RasterConfig
    from splat_trainer_tpu.models import mlp_scene as ms
    from splat_trainer_tpu.trainer.train_step import (
        TrainBatch, make_hyper, train_step,
    )
    from splat_trainer_tpu.utils import transforms
    import functools

    n_points = 1_000_000
    image_size = (1536, 1024)
    w, h = image_size

    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 6)
    # garden-like statistics: points in a ~4-unit shell, small scales
    gaussians = Gaussians3D(
        position=jax.random.normal(ks[0], (n_points, 3)) * 1.5,
        rotation=transforms.normalize(jax.random.normal(ks[1], (n_points, 4))),
        log_scaling=jax.random.uniform(ks[2], (n_points, 3),
                                       minval=-6.0, maxval=-4.0),
        alpha_logit=jax.random.uniform(ks[3], (n_points, 1),
                                       minval=-2.0, maxval=2.0),
        feature=jax.random.uniform(ks[4], (n_points, 3)),
    )
    config = ms.MLPSceneConfig()
    scene = ms.init_scene(ks[5], config, gaussians, num_images=200,
                          capacity=n_points)
    pstate = PointState.new_zeros(scene.capacity)

    rcfg = RasterConfig(max_instances=1 << 22, chunk_size=128)

    eye = np.array([0.0, 0.0, -6.0], np.float32)
    T = np.eye(4, dtype=np.float32)
    T[:3, 3] = -T[:3, :3] @ eye
    fx = 0.5 * w / np.tan(np.radians(30.0))
    camera_t_world = jnp.asarray(T)[None]
    projection = jnp.asarray([fx, fx, w / 2, h / 2])[None]

    batch = TrainBatch(
        images=(jax.random.uniform(ks[4], (1, h, w, 3)) * 255).astype(jnp.uint8),
        image_idx=jnp.array([0]),
        T_camera_world=camera_t_world,
        projection=projection,
        near=jnp.array([0.1]),
        far=jnp.array([100.0]),
    )

    class _Cfg:
        l1_weight, mse_weight, ssim_weight = 0.0, 10.0, 1.0

    hyper = make_hyper(config, _Cfg, 0.1)

    step = jax.jit(functools.partial(
        train_step, scene_config=config, raster_config=rcfg,
        image_size=image_size, ssim_levels=3), donate_argnums=(0, 1))

    # compile + warmup
    scene, pstate, metrics = step(scene, pstate, batch, hyper, ks[0])
    jax.block_until_ready(metrics.mse)

    iters = 20
    t0 = time.time()
    for i in range(iters):
        scene, pstate, metrics = step(scene, pstate, batch, hyper, ks[0])
    jax.block_until_ready(metrics.mse)
    dt = (time.time() - t0) / iters

    images_per_sec = 1.0 / dt
    print(json.dumps({
        "metric": "train_images_per_sec_per_chip",
        "value": round(images_per_sec, 3),
        "unit": "images/sec/chip",
        "vs_baseline": round(images_per_sec / BASELINE_IMAGES_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
