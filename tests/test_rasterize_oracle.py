"""Validate the dense oracle: analytic backward == autodiff backward."""

import jax
import jax.numpy as jnp
import numpy as np

from splat_trainer_tpu.core.types import RasterConfig
from splat_trainer_tpu.ops import projection, rasterize_jnp, tiling
from tests.fixtures import look_at_camera, random_gaussians


def make_inputs(n=200, image_size=(64, 48), seed=0):
    key = jax.random.PRNGKey(seed)
    g = random_gaussians(key, n)
    cam = look_at_camera(image_size)
    config = RasterConfig(tile_size=16)
    grid = tiling.make_tile_grid(image_size, config.tile_size)

    g2d = projection.project_to_image(g, cam, config)
    order = jnp.argsort(jnp.where(g2d.visible, g2d.depth, jnp.inf))

    rect, _span = tiling.tile_rects(g2d.mean, g2d.radius, g2d.visible, grid)
    rect = jnp.stack(rect, axis=-1)
    colors = g.feature

    inputs = rasterize_jnp.DenseInputs(
        mean=g2d.mean[order],
        conic=g2d.conic[order],
        opacity=g2d.opacity[order],
        color=colors[order],
        depth_ndc=projection.ndc_depth(g2d.depth, cam.near_plane, cam.far_plane)[order],
        rect=rect[order],
        visible=g2d.visible[order],
    )
    return inputs, cam, grid, config, image_size


def test_forward_properties():
    inputs, cam, grid, config, image_size = make_inputs()
    image, alpha, median_ndc, vis = rasterize_jnp.dense_forward(
        inputs, image_size, grid, config)

    assert image.shape == (48, 64, 3)
    assert np.isfinite(np.asarray(image)).all()
    assert (np.asarray(alpha) >= 0).all() and (np.asarray(alpha) <= 1 + 1e-5).all()
    assert (np.asarray(vis) >= 0).all()
    # visible gaussians should produce some visibility
    assert np.asarray(vis).sum() > 0
    assert np.asarray(median_ndc).min() >= 0 and np.asarray(median_ndc).max() <= 1


def test_analytic_backward_matches_autodiff():
    inputs, cam, grid, config, image_size = make_inputs()

    def fwd(mean, conic, opacity, color):
        inp = inputs._replace(mean=mean, conic=conic, opacity=opacity, color=color)
        image, alpha_img, _, _ = rasterize_jnp.dense_forward(inp, image_size, grid, config)
        return image, alpha_img

    key = jax.random.PRNGKey(42)
    ct_image = jax.random.normal(key, (image_size[1], image_size[0], 3))
    ct_alpha = jax.random.normal(jax.random.PRNGKey(43), (image_size[1], image_size[0]))

    primals = (inputs.mean, inputs.conic, inputs.opacity, inputs.color)
    _, vjp_fn = jax.vjp(fwd, *primals)
    ad_mean, ad_conic, ad_op, ad_color = vjp_fn((ct_image, ct_alpha))

    d_mean, d_conic, d_op, d_color, split_score, prune_cost = (
        rasterize_jnp.dense_backward(inputs, image_size, grid, config, ct_image, ct_alpha))

    np.testing.assert_allclose(d_color, ad_color, atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(d_op, ad_op, atol=1e-4, rtol=1e-3)
    np.testing.assert_allclose(d_mean, ad_mean, atol=1e-4, rtol=1e-3)
    np.testing.assert_allclose(d_conic, ad_conic, atol=1e-4, rtol=1e-3)

    assert (np.asarray(split_score) >= 0).all()
    assert (np.asarray(prune_cost) >= 0).all()


def test_projection_visibility():
    key = jax.random.PRNGKey(1)
    g = random_gaussians(key, 100)
    cam = look_at_camera((64, 64))
    config = RasterConfig()
    g2d = projection.project_to_image(g, cam, config)
    # gaussians centered around origin, camera looks at origin -> most visible
    assert int(g2d.visible.sum()) > 50
    # means of visible gaussians should be near the image
    vis = np.asarray(g2d.visible)
    means = np.asarray(g2d.mean)[vis]
    radius = np.asarray(g2d.radius)[vis]
    assert ((means[:, 0] + radius > 0) & (means[:, 0] - radius < 64)).all()


def test_behind_camera_culled():
    key = jax.random.PRNGKey(2)
    g = random_gaussians(key, 50)
    # move all points behind the camera
    g = g.replace(position=g.position.at[:, 2].set(-10.0))
    cam = look_at_camera((32, 32))
    g2d = projection.project_to_image(g, cam, RasterConfig())
    assert int(g2d.visible.sum()) == 0
