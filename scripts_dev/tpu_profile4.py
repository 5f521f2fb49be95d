"""Dev: component timing at bench scale (1M points, 1536x1024)."""

import sys, time, functools
sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from splat_trainer_tpu.core.types import CameraParams, Gaussians3D, RasterConfig
from splat_trainer_tpu.ops import projection, rasterize_pallas, renderer, tiling
from splat_trainer_tpu.ops.ssim import multiscale_ssim_loss
from splat_trainer_tpu.models import color_model as cm
from splat_trainer_tpu.utils import transforms


def timeit(name, fn, *args, iters=10):
    t0 = time.time()
    out = jax.block_until_ready(fn(*args))
    ct = time.time() - t0
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    print(f"{name:30s} compile {ct:7.1f}s   run {(time.time()-t0)/iters*1000:9.3f} ms", flush=True)
    return out


def main():
    print("backend:", jax.default_backend(), flush=True)
    n = 1_000_000
    image_size = (1536, 1024)
    w, h = image_size
    cfg = RasterConfig(max_instances=1 << 22, chunk_size=128)
    grid = tiling.make_tile_grid(image_size, cfg.tile_size)

    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 6)
    g = Gaussians3D(
        position=jax.random.normal(ks[0], (n, 3)) * 1.5,
        rotation=transforms.normalize(jax.random.normal(ks[1], (n, 4))),
        log_scaling=jax.random.uniform(ks[2], (n, 3), minval=-6.0, maxval=-4.0),
        alpha_logit=jax.random.uniform(ks[3], (n, 1), minval=-2.0, maxval=2.0),
        feature=jax.random.uniform(ks[4], (n, 3)),
    )
    T = np.eye(4, dtype=np.float32)
    T[:3, 3] = [0, 0, 6]
    fx = 0.5 * w / np.tan(np.radians(30.0))
    cam = CameraParams.create(T, [fx, fx, w / 2, h / 2], image_size)

    g2d = timeit("project 1M", jax.jit(
        lambda g: projection.project_to_image(g, cam, cfg)), g)
    print("   visible:", int(g2d.visible.sum()), flush=True)

    def expand(g2d):
        ndc = projection.ndc_depth(g2d.depth, cam.near_plane, cam.far_plane)
        radius = jnp.where(g2d.visible, g2d.radius, 0.0)
        return tiling.expand_and_sort(g2d.mean, radius, radius >= 1, ndc, cfg, grid)

    inst = timeit("expand+sort 4M", jax.jit(expand), g2d)
    print("   instances:", int(inst.total), "clipped:", int(inst.clipped), flush=True)

    def pack(g2d, gid):
        ndc = projection.ndc_depth(g2d.depth, cam.near_plane, cam.far_plane)
        rows = jnp.stack([
            g2d.mean[:, 0][gid], g2d.mean[:, 1][gid],
            g2d.conic[:, 0][gid], g2d.conic[:, 1][gid], g2d.conic[:, 2][gid],
            g2d.opacity[gid],
            g.feature[:, 0][gid], g.feature[:, 1][gid], g.feature[:, 2][gid],
            ndc[gid]])
        return jnp.concatenate([rows, jnp.zeros((6, gid.shape[0]))], axis=0)

    packed = timeit("pack 4M (stacked rows)", jax.jit(pack), g2d,
                    inst.sorted_gid)

    fwd = jax.jit(functools.partial(
        rasterize_pallas.rasterize_forward, grid=grid, image_size=image_size,
        config=cfg, n_points=n))
    tile_img, vis_out = timeit("pallas fwd kernel", fwd, inst.tile_starts,
                               inst.tile_counts, inst.out_starts, packed)

    timeit("tiles_to_image", jax.jit(functools.partial(
        rasterize_pallas.tiles_to_image, grid=grid, image_size=image_size)),
        tile_img[:, :5])

    ct = jnp.ones_like(tile_img[:, :4])
    m_out = tiling.out_capacity(packed.shape[1], grid, cfg.chunk_size)
    bwd = jax.jit(functools.partial(
        rasterize_pallas.rasterize_backward, grid=grid, image_size=image_size,
        config=cfg, m_out=m_out, n_points=n))
    timeit("pallas bwd kernel", bwd, inst.tile_starts, inst.tile_counts,
           inst.out_starts, packed, ct, tile_img)

    timeit("segment vis", jax.jit(lambda v: jax.ops.segment_sum(
        jnp.where(v[1] < n, v[0], 0.0),
        jnp.minimum(v[1].astype(jnp.int32), n - 1),
        num_segments=n)), vis_out)

    # color model at 1M
    ccfg = cm.ColorModelConfig()
    params = cm.init_color_model(jax.random.PRNGKey(1), ccfg, 32, 16)
    feats = jax.random.normal(key, (n, 16))
    glo = jnp.zeros((32,))
    timeit("color MLP 1M (bf16)", jax.jit(lambda f: cm.eval_colors(
        params, ccfg, f, g.position, cam.camera_position, glo)), feats)

    # ssim at full res
    img1 = jax.random.uniform(key, (h, w, 3))
    img2 = jax.random.uniform(ks[1], (h, w, 3))
    timeit("ms-ssim 3 levels", jax.jit(
        lambda a, b: multiscale_ssim_loss(a, b, 3)[0]), img1, img2)

    # full fused fwd (render_gaussians)
    timeit("full render fwd", jax.jit(lambda g: renderer.render_gaussians(
        g, g.feature, cam, cfg).image), g)


if __name__ == "__main__":
    main()
