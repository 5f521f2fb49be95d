"""Benchmark CLI: render fwd / fwd+bwd / full-step timing.

Working replacement for the reference's stale scripts/benchmark.py:11-66
(SURVEY.md #37): times projection+binning+compositing forward, the custom
VJP backward, and the full train step on a synthetic scene or a dataset.
"""

import argparse
import functools
import json
import time


def timed(fn, *args, iters=10):
    import jax
    t0 = time.time()
    out = jax.block_until_ready(fn(*args))
    compile_s = time.time() - t0
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return compile_s, (time.time() - t0) / iters


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--points", type=int, default=1_000_000)
    p.add_argument("--width", type=int, default=1536)
    p.add_argument("--height", type=int, default=1024)
    p.add_argument("--max-instances", type=int, default=1 << 22)
    p.add_argument("--chunk-size", type=int, default=128)
    p.add_argument("--iters", type=int, default=10)
    p.add_argument("--profile", default=None, metavar="DIR",
                   help="write a jax.profiler trace of the timed train-step "
                        "loop to DIR (view with tensorboard or perfetto)")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from splat_trainer_tpu.controller.point_state import PointState
    from splat_trainer_tpu.core.types import Gaussians3D, RasterConfig
    from splat_trainer_tpu.models import mlp_scene as ms
    from splat_trainer_tpu.ops import renderer
    from splat_trainer_tpu.trainer.train_step import TrainBatch, make_hyper, train_step
    from splat_trainer_tpu.utils import transforms

    n = args.points
    image_size = (args.width, args.height)
    w, h = image_size

    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 6)
    g = Gaussians3D(
        position=jax.random.normal(ks[0], (n, 3)) * 1.5,
        rotation=transforms.normalize(jax.random.normal(ks[1], (n, 4))),
        log_scaling=jax.random.uniform(ks[2], (n, 3), minval=-6.0, maxval=-4.0),
        alpha_logit=jax.random.uniform(ks[3], (n, 1), minval=-2.0, maxval=2.0),
        feature=jax.random.uniform(ks[4], (n, 3)),
    )
    rcfg = RasterConfig(max_instances=args.max_instances,
                        chunk_size=args.chunk_size)

    import numpy as np
    T = np.eye(4, dtype=np.float32)
    T[:3, 3] = [0, 0, 6]
    fx = 0.5 * w / np.tan(np.radians(30.0))
    from splat_trainer_tpu.core.types import CameraParams
    cam = CameraParams.create(T, [fx, fx, w / 2, h / 2], image_size)

    results = {}

    fwd = jax.jit(lambda g: renderer.render_gaussians(
        g, g.feature, cam, rcfg).image)
    c, t = timed(fwd, g, iters=args.iters)
    results["render_fwd_ms"] = round(t * 1000, 3)
    print(f"render fwd:      compile {c:6.1f}s  {t * 1000:8.2f} ms")

    target = jnp.zeros((h, w, 3))

    @jax.jit
    def fwd_bwd(g):
        def loss(pos, feat):
            gg = g.replace(position=pos, feature=feat)
            r = renderer.render_gaussians(gg, feat, cam, rcfg)
            return ((r.image - target) ** 2).mean()
        return jax.grad(loss, argnums=(0, 1))(g.position, g.feature)

    c, t = timed(fwd_bwd, g, iters=args.iters)
    results["render_fwd_bwd_ms"] = round(t * 1000, 3)
    print(f"render fwd+bwd:  compile {c:6.1f}s  {t * 1000:8.2f} ms")

    config = ms.MLPSceneConfig()
    scene = ms.init_scene(ks[5], config, g, num_images=8, capacity=n)
    pstate = PointState.new_zeros(scene.capacity)

    class _Cfg:
        l1_weight, mse_weight, ssim_weight = 0.0, 10.0, 1.0

    hyper = make_hyper(config, _Cfg, 0.1)
    batch = TrainBatch(
        images=(jax.random.uniform(ks[4], (1, h, w, 3)) * 255).astype(jnp.uint8),
        image_idx=jnp.array([0]),
        T_camera_world=cam.T_camera_world[None],
        projection=cam.projection[None],
        near=cam.near_plane[None], far=cam.far_plane[None])

    step = jax.jit(functools.partial(
        train_step, scene_config=config, raster_config=rcfg,
        image_size=image_size, ssim_levels=3), donate_argnums=(0, 1))

    t0 = time.time()
    scene, pstate, m = step(scene, pstate, batch, hyper, ks[0])
    jax.block_until_ready(m.mse)
    c = time.time() - t0
    import contextlib
    trace_ctx = (jax.profiler.trace(args.profile)
                 if args.profile else contextlib.nullcontext())
    with trace_ctx:
        t0 = time.time()
        for _ in range(args.iters):
            scene, pstate, m = step(scene, pstate, batch, hyper, ks[0])
        jax.block_until_ready(m.mse)
        t = (time.time() - t0) / args.iters
    if args.profile:
        print(f"profiler trace written to {args.profile}")
    results["train_step_ms"] = round(t * 1000, 3)
    results["images_per_sec"] = round(1.0 / t, 3)
    print(f"full train step: compile {c:6.1f}s  {t * 1000:8.2f} ms "
          f"({1 / t:.2f} images/sec)")
    print(json.dumps(results))


if __name__ == "__main__":
    main()
