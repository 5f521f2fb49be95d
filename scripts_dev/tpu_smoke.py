"""Dev smoke test: compile + run the Pallas rasterizer on the real TPU."""

import time

import jax
import jax.numpy as jnp

from splat_trainer_tpu.core.types import RasterConfig
from splat_trainer_tpu.ops import renderer
from splat_trainer_tpu.utils import transforms


def random_gaussians(key, n, extent=1.0):
    from splat_trainer_tpu.core.types import Gaussians3D
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    return Gaussians3D(
        position=jax.random.uniform(k1, (n, 3), minval=-extent, maxval=extent),
        rotation=transforms.normalize(jax.random.normal(k2, (n, 4))),
        log_scaling=jax.random.uniform(k3, (n, 3), minval=-5.5, maxval=-3.0),
        alpha_logit=jax.random.uniform(k4, (n, 1), minval=-1.0, maxval=3.0),
        feature=jax.random.uniform(k5, (n, 3)),
    )


def look_at_camera(image_size, eye=(0.0, 0.0, -4.0), fov_deg=50.0):
    import numpy as np
    from splat_trainer_tpu.core.types import CameraParams
    w, h = image_size
    eye = np.asarray(eye, np.float32)
    fwd = -eye / np.linalg.norm(eye)
    up = np.array([0.0, 1.0, 0.0], np.float32)
    right = np.cross(up, fwd); right /= np.linalg.norm(right)
    up = np.cross(fwd, right)
    T = np.eye(4, dtype=np.float32)
    T[:3, :3] = np.stack([right, up, fwd], axis=1).T
    T[:3, 3] = -T[:3, :3] @ eye
    fx = 0.5 * w / np.tan(np.radians(fov_deg) / 2)
    return CameraParams.create(T, [fx, fx, w / 2, h / 2], image_size)


def main():
    print("backend:", jax.default_backend(), jax.devices())
    n = 100_000
    image_size = (1024, 768)
    cfg = RasterConfig(backend="pallas", max_instances=1 << 20, chunk_size=128,
                       render_median_depth=True)
    g = random_gaussians(jax.random.PRNGKey(0), n)
    cam = look_at_camera(image_size)
    target = jnp.zeros((image_size[1], image_size[0], 3))

    @jax.jit
    def fwd(g):
        r = renderer.render_gaussians(g, g.feature, cam, cfg)
        return r.image, r.alpha, r.points.visibility, r.clipped_instances

    t0 = time.time()
    img, alpha, vis, clipped = jax.block_until_ready(fwd(g))
    print(f"fwd compile+run {time.time()-t0:.2f}s  alpha_mean={alpha.mean():.4f} "
          f"vis_sum={vis.sum():.1f} clipped={clipped}")
    t0 = time.time()
    for _ in range(10):
        img, alpha, vis, clipped = fwd(g)
    jax.block_until_ready(img)
    print(f"fwd: {(time.time()-t0)/10*1000:.2f} ms/frame")

    @jax.jit
    def step(g, heur):
        def loss_fn(pos, logs, alpha_logit, feat, heur):
            gg = g.replace(position=pos, log_scaling=logs, alpha_logit=alpha_logit,
                           feature=feat)
            r = renderer.render_gaussians(gg, feat, cam, cfg, heur_sink=heur)
            return ((r.image - target) ** 2).mean()
        grads = jax.grad(loss_fn, argnums=(0, 1, 2, 3, 4))(
            g.position, g.log_scaling, g.alpha_logit, g.feature, heur)
        return grads

    heur = jnp.zeros((n, 2))
    t0 = time.time()
    grads = jax.block_until_ready(step(g, heur))
    print(f"fwd+bwd compile+run {time.time()-t0:.2f}s")
    t0 = time.time()
    for _ in range(10):
        grads = step(g, heur)
    jax.block_until_ready(grads)
    print(f"fwd+bwd: {(time.time()-t0)/10*1000:.2f} ms/step")
    print("split/prune nonzero:", (grads[4][:, 0] > 0).sum(), (grads[4][:, 1] > 0).sum())


if __name__ == "__main__":
    main()
