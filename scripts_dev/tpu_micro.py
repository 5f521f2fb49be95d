"""Micro-benchmarks of the primitives inside expand_and_sort on TPU."""

import sys, time, functools
sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from splat_trainer_tpu.core.types import RasterConfig
from splat_trainer_tpu.ops import projection, tiling
from scripts_dev.tpu_smoke import random_gaussians, look_at_camera


def timeit(name, fn, *args, iters=20):
    t0 = time.time()
    out = jax.block_until_ready(fn(*args))
    ct = time.time() - t0
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    print(f"{name:34s} compile {ct:7.2f}s   run {(time.time()-t0)/iters*1000:8.3f} ms", flush=True)
    return out


def main():
    print("backend:", jax.default_backend(), flush=True)
    M = 1 << 21
    N = 100_000

    key = jax.random.PRNGKey(0)
    x_i32 = jax.random.randint(key, (M,), 0, 1 << 20, dtype=jnp.int32)
    starts = jnp.sort(jax.random.randint(key, (N,), 0, M, dtype=jnp.int32))
    vals = jax.random.normal(key, (M,))

    timeit("cumsum 2M i32", jax.jit(lambda x: jnp.cumsum(x)), x_i32)
    timeit("assoc_scan max 2M i32",
           jax.jit(lambda x: jax.lax.associative_scan(jnp.maximum, x)), x_i32)
    timeit("lax.cummax 2M i32", jax.jit(jax.lax.cummax), x_i32)
    timeit("scatter-max 100k -> 2M",
           jax.jit(lambda s: jnp.zeros((M,), jnp.int32).at[s].max(
               jnp.arange(N, dtype=jnp.int32), mode="drop")), starts)
    timeit("searchsorted 3073 over 2M",
           jax.jit(lambda x: jnp.searchsorted(
               x, jnp.arange(3073, dtype=jnp.int32) * 683)), jnp.sort(x_i32))
    timeit("gather 2M from 100k",
           jax.jit(lambda g: jnp.arange(N, dtype=jnp.float32)[g]),
           jax.random.randint(key, (M,), 0, N, dtype=jnp.int32))
    timeit("scatter-add 2M -> 100k",
           jax.jit(lambda v, g: jnp.zeros((N,), jnp.float32).at[g].add(v)),
           vals, jax.random.randint(key, (M,), 0, N, dtype=jnp.int32))
    timeit("segment_sum 2Mx16 -> 100kx16",
           jax.jit(lambda v, g: jax.ops.segment_sum(v, g, num_segments=N)),
           jax.random.normal(key, (M, 16)), jax.random.randint(key, (M,), 0, N, dtype=jnp.int32))

    # full expand for reference
    cfg = RasterConfig(backend="pallas", max_instances=M, chunk_size=128)
    image_size = (1024, 768)
    grid = tiling.make_tile_grid(image_size, cfg.tile_size)
    g = random_gaussians(jax.random.PRNGKey(0), N)
    cam = look_at_camera(image_size)
    g2d = jax.jit(lambda g: projection.project_to_image(g, cam, cfg))(g)

    def expand(g2d):
        ndc = projection.ndc_depth(g2d.depth, cam.near_plane, cam.far_plane)
        radius = jnp.where(g2d.visible, g2d.radius, 0.0)
        return tiling.expand_and_sort(g2d.mean, radius, radius >= 1, ndc, cfg, grid)

    timeit("expand_and_sort (full)", jax.jit(expand), g2d)

    # pieces of expand, staged
    (x0, y0, x1, y1), span = tiling.tile_rects(g2d.mean, jnp.where(g2d.visible, g2d.radius, 0.), g2d.visible, grid)

    def stage1(span):
        offsets = jnp.cumsum(span) - span
        starts = jnp.where(span > 0, offsets, M)
        marks = jnp.zeros((M,), jnp.int32).at[starts].max(
            jnp.arange(span.shape[0], dtype=jnp.int32), mode="drop")
        return jax.lax.associative_scan(jnp.maximum, marks)

    gid = timeit("  stage1: offsets+scatter+scan", jax.jit(stage1), span)

    def stage2(gid):
        offsets = jnp.cumsum(span) - span
        inst = jnp.arange(M, dtype=jnp.int32)
        r = inst - offsets[gid]
        sx = jnp.maximum(x1 - x0, 1)[gid]
        tx = x0[gid] + r % sx
        ty = y0[gid] + r // sx
        return (ty * grid.ntx + tx).astype(jnp.uint32)

    tile = timeit("  stage2: gathers+tile", jax.jit(stage2), gid)

    def stage3(tile, gid):
        db = grid.depth_bits
        ndc = projection.ndc_depth(g2d.depth, cam.near_plane, cam.far_plane)
        dq = jnp.minimum((jnp.clip(ndc[gid], 0, 1) * float((1 << db) - 1)).astype(jnp.uint32),
                         jnp.uint32((1 << db) - 1))
        key = (tile << db) | dq
        return jax.lax.sort_key_val(key, gid)

    sk, sg = timeit("  stage3: key+sort", jax.jit(stage3), tile, gid)

    def stage4(sk):
        db = grid.depth_bits
        bounds = jnp.arange(grid.num_tiles + 1, dtype=jnp.uint32) << db
        return jnp.searchsorted(sk, bounds, side="left").astype(jnp.int32)

    timeit("  stage4: tile ranges", jax.jit(stage4), sk)


if __name__ == "__main__":
    main()
