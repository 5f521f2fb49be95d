"""Dev: per-component timing of the render pipeline on TPU."""

import time
import functools

import jax
import jax.numpy as jnp

from splat_trainer_tpu.core.types import RasterConfig
from splat_trainer_tpu.ops import projection, rasterize_pallas, tiling
import sys; sys.path.insert(0, "/root/repo"); from scripts_dev.tpu_smoke import random_gaussians, look_at_camera


def timeit(name, fn, *args, iters=10):
    t0 = time.time()
    out = jax.block_until_ready(fn(*args))
    compile_time = time.time() - t0
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    print(f"{name:28s} compile {compile_time:7.2f}s   run {(time.time()-t0)/iters*1000:8.3f} ms")
    return out


def main():
    print("backend:", jax.default_backend())
    n = 100_000
    image_size = (1024, 768)
    cfg = RasterConfig(backend="pallas", max_instances=1 << 21, chunk_size=128)
    grid = tiling.make_tile_grid(image_size, cfg.tile_size)
    g = random_gaussians(jax.random.PRNGKey(0), n)
    cam = look_at_camera(image_size)

    proj = jax.jit(lambda g: projection.project_to_image(g, cam, cfg))
    g2d = timeit("project", proj, g)

    def expand(g2d):
        ndc = projection.ndc_depth(g2d.depth, cam.near_plane, cam.far_plane)
        radius = jnp.where(g2d.visible, g2d.radius, 0.0)
        return tiling.expand_and_sort(g2d.mean, radius, radius >= 1, ndc, cfg, grid)

    inst = timeit("expand+sort", jax.jit(expand), g2d)
    print("   total instances:", int(inst.total), "clipped:", int(inst.clipped))

    def pack(g2d, inst):
        ndc = projection.ndc_depth(g2d.depth, cam.near_plane, cam.far_plane)
        packed = jnp.concatenate([
            g2d.mean, g2d.conic, g2d.opacity[:, None], g.feature, ndc[:, None],
            jnp.arange(n, dtype=jnp.float32)[:, None],
            jnp.zeros((n, 5), jnp.float32)], axis=1)[inst.sorted_gid].T
        return packed

    packed = timeit("gather+pack", jax.jit(pack), g2d, inst)

    fwd = jax.jit(functools.partial(
        rasterize_pallas.rasterize_forward, grid=grid, image_size=image_size,
        config=cfg, n_points=n))
    tile_img, vis_out = timeit(
        "pallas fwd kernel", lambda s, c, o, p: fwd(s, c, o, p),
        inst.tile_starts, inst.tile_counts, inst.out_starts, packed)

    ct = jnp.ones_like(tile_img[:, :4])
    m_out = tiling.out_capacity(packed.shape[1], grid, cfg.chunk_size)
    bwd = jax.jit(functools.partial(
        rasterize_pallas.rasterize_backward, grid=grid, image_size=image_size,
        config=cfg, m_out=m_out, n_points=n))
    timeit("pallas bwd kernel", lambda s, cn, o, p, c, ti: bwd(s, cn, o, p, c, ti),
           inst.tile_starts, inst.tile_counts, inst.out_starts, packed, ct,
           tile_img)

    seg = jax.jit(lambda vis: jax.ops.segment_sum(
        jnp.where(vis[1] < n, vis[0], 0.0),
        jnp.minimum(vis[1].astype(jnp.int32), n - 1), num_segments=n))
    timeit("segment_sum vis", seg, vis_out)

    # sub-pieces of expand
    def sort_only(key_like):
        return jax.lax.sort_key_val(key_like, jnp.arange(key_like.shape[0], dtype=jnp.int32))
    keys = jax.random.randint(jax.random.PRNGKey(1), (cfg.max_instances,), 0, 1 << 30, dtype=jnp.int32).astype(jnp.uint32)
    timeit("  sort 2M u32", jax.jit(sort_only), keys)

    def searchsorted_only(offsets):
        i = jnp.arange(cfg.max_instances, dtype=jnp.int32)
        return jnp.searchsorted(offsets, i, side="right")
    offsets = jnp.sort(jax.random.randint(jax.random.PRNGKey(2), (n,), 0, 1 << 20, dtype=jnp.int32))
    timeit("  searchsorted 2M over 100k", jax.jit(searchsorted_only), offsets)


if __name__ == "__main__":
    main()
