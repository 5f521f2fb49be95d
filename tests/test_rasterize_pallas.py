"""Parity tests: Pallas tile kernels (interpret mode) vs. the dense oracle."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from splat_trainer_tpu.core.types import RasterConfig
from splat_trainer_tpu.ops import projection, renderer
from tests.fixtures import look_at_camera, random_gaussians

IMAGE_SIZE = (48, 32)


def setup(n=150, seed=0, **cfg):
    key = jax.random.PRNGKey(seed)
    g = random_gaussians(key, n)
    cam = look_at_camera(IMAGE_SIZE)
    config = dict(tile_size=16, max_instances=1024, chunk_size=16)
    config.update(cfg)
    return g, cam, config


def render_with(backend, g, cam, config):
    cfg = RasterConfig(backend=backend, render_median_depth=True, **config)
    colors = g.feature
    return renderer.render_gaussians(g, colors, cam, cfg)


def test_forward_parity():
    g, cam, config = setup()
    r_dense = render_with("dense", g, cam, config)
    r_pallas = render_with("pallas", g, cam, config)

    np.testing.assert_allclose(r_pallas.image, r_dense.image, atol=2e-4)
    np.testing.assert_allclose(r_pallas.alpha, r_dense.alpha, atol=2e-4)
    np.testing.assert_allclose(
        r_pallas.points.visibility, r_dense.points.visibility, atol=2e-4)
    np.testing.assert_allclose(
        r_pallas.median_ndc_image, r_dense.median_ndc_image, atol=1e-4)
    # scene actually renders something
    assert float(r_dense.alpha.mean()) > 0.05


def loss_and_grads(backend, g, cam, config):
    cfg = RasterConfig(backend=backend, **config)
    n = g.num_points
    target = jnp.zeros((IMAGE_SIZE[1], IMAGE_SIZE[0], 3))

    def loss_fn(colors, position, log_scaling, alpha_logit, heur_sink):
        gg = g.replace(position=position, log_scaling=log_scaling,
                       alpha_logit=alpha_logit)
        r = renderer.render_gaussians(gg, colors, cam, cfg, heur_sink=heur_sink)
        return ((r.image - target) ** 2).sum() + (r.alpha ** 2).sum() * 0.1

    heur0 = jnp.zeros((n, 2))
    grads = jax.grad(loss_fn, argnums=(0, 1, 2, 3, 4))(
        g.feature, g.position, g.log_scaling, g.alpha_logit, heur0)
    return grads


def test_backward_parity():
    # f32 gradient reduction vs the dense oracle at tight tolerance; the
    # bf16-packed default's looser precision band is covered by
    # test_grad_bf16_pack_parity below.
    g, cam, config = setup(n=120, seed=3, grad_bf16_pack=False)
    gd = loss_and_grads("dense", g, cam, config)
    gp = loss_and_grads("pallas", g, cam, config)

    names = ["color", "position", "log_scaling", "alpha_logit", "heuristics"]
    for name, a, b in zip(names, gd, gp):
        a, b = np.asarray(a), np.asarray(b)
        scale = max(np.abs(a).max(), 1e-6)
        np.testing.assert_allclose(b, a, atol=2e-3 * scale, err_msg=name)

    # heuristics are nonzero where gradients flow
    heur = np.asarray(gp[4])
    assert heur[:, 0].max() > 0, "split_score should be nonzero"
    assert heur[:, 1].max() > 0, "prune_cost should be nonzero"


def test_overflow_is_counted_not_silent():
    g, cam, config = setup(n=300, max_instances=64, chunk_size=16)
    r = render_with("pallas", g, cam, config)
    assert int(r.clipped_instances) > 0


@pytest.mark.parametrize("image_size", [(40, 24), (33, 17)])
def test_non_tile_aligned_images(image_size):
    """Images not divisible by tile_size must crop/pad consistently."""
    key = jax.random.PRNGKey(7)
    g = random_gaussians(key, 80)
    cam = look_at_camera(image_size)
    config = dict(tile_size=16, max_instances=512, chunk_size=16)
    rd = render_with("dense", g, cam, config)
    rp = render_with("pallas", g, cam, config)
    assert rp.image.shape == (image_size[1], image_size[0], 3)
    np.testing.assert_allclose(rp.image, rd.image, atol=2e-4)
    np.testing.assert_allclose(
        rp.points.visibility, rd.points.visibility, atol=2e-4)


def test_compacted_render_capacity_parity():
    """max_render_instances < max_instances: ellipse-culled instances are
    compacted; output must match the dense oracle exactly (the cull is
    lossless) as long as survivors fit."""
    g, cam, config = setup(n=150, seed=5)
    config.update(max_instances=2048, max_render_instances=512)
    rd = render_with("dense", g, cam, dict(tile_size=16, max_instances=2048,
                                           chunk_size=16))
    rp = render_with("pallas", g, cam, config)
    assert int(rp.clipped_instances) == 0, "survivors must fit in 512"
    np.testing.assert_allclose(rp.image, rd.image, atol=2e-4)
    np.testing.assert_allclose(
        rp.points.visibility, rd.points.visibility, atol=2e-4)


def test_grad_bf16_pack_parity():
    """grad_bf16_pack quantizes per-instance gradient lanes to bf16 before
    the f32 per-gaussian reduction — gradients must match the f32 path
    within bf16 relative tolerance and the forward must be bit-identical."""
    g, cam, config = setup(n=120, seed=3)
    gp32 = loss_and_grads("pallas", g, cam,
                          dict(config, grad_bf16_pack=False))
    gp16 = loss_and_grads("pallas", g, cam, dict(config, grad_bf16_pack=True))

    names = ["color", "position", "log_scaling", "alpha_logit", "heuristics"]
    for name, a, b in zip(names, gp32, gp16):
        a, b = np.asarray(a), np.asarray(b)
        scale = max(np.abs(a).max(), 1e-6)
        # bf16 has 8 mantissa bits: ~0.4% per-instance quantization, summed
        # over a handful of instances per gaussian
        np.testing.assert_allclose(b, a, atol=2e-2 * scale, err_msg=name)

    r32 = render_with("pallas", g, cam, config)
    r16 = render_with("pallas", g, cam, dict(config, grad_bf16_pack=True))
    np.testing.assert_array_equal(r32.image, r16.image)


@pytest.mark.parametrize("tiles_per_block", [3, 4])
def test_tiles_per_block_parity(tiles_per_block):
    """tiles_per_block > 1 unrolls several tiles into one grid step; the
    output and gradients must be identical to the one-tile-per-step path
    (3 exercises a tail block: the 48x32 image has 3x2 = 6 tiles)."""
    g, cam, config = setup(n=120, seed=3)
    r1 = render_with("pallas", g, cam, config)
    rg = render_with("pallas", g, cam,
                     dict(config, tiles_per_block=tiles_per_block))
    np.testing.assert_array_equal(r1.image, rg.image)
    np.testing.assert_array_equal(r1.alpha, rg.alpha)
    np.testing.assert_array_equal(r1.points.visibility, rg.points.visibility)

    g1 = loss_and_grads("pallas", g, cam, config)
    gg = loss_and_grads("pallas", g, cam,
                        dict(config, tiles_per_block=tiles_per_block))
    for a, b in zip(g1, gg):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_tile_size_parity():
    """tile_size only changes binning granularity (bench.py auto-tunes it):
    the composite per pixel is the same depth-sorted instance set, so
    outputs and gradients must match across tile sizes up to chunk-
    association float noise (f32 reduction: the two tile sizes produce
    different instance sets, so bf16 packing noise would not cancel)."""
    g, cam, config = setup(n=120, seed=3, grad_bf16_pack=False)
    r16 = render_with("pallas", g, cam, config)
    r32 = render_with("pallas", g, cam, dict(config, tile_size=32))
    np.testing.assert_allclose(r32.image, r16.image, atol=2e-4)
    np.testing.assert_allclose(r32.alpha, r16.alpha, atol=2e-4)
    np.testing.assert_allclose(r32.points.visibility,
                               r16.points.visibility, atol=2e-4)

    g16 = loss_and_grads("pallas", g, cam, config)
    g32 = loss_and_grads("pallas", g, cam, dict(config, tile_size=32))
    names = ["color", "position", "log_scaling", "alpha_logit", "heuristics"]
    for name, a, b in zip(names, g16, g32):
        a, b = np.asarray(a), np.asarray(b)
        scale = max(np.abs(a).max(), 1e-6)
        np.testing.assert_allclose(b, a, atol=2e-3 * scale, err_msg=name)


def test_kernel_variant_parity():
    """The kernel strategy knobs (basis matmuls, cumprod transmittance
    scan) are lossless reformulations: forward images and gradients must
    match the elementwise/log-space path within float-association noise."""
    g, cam, config = setup(n=120, seed=3, grad_bf16_pack=False)
    base = dict(config, kernel_basis=False, cumprod_scan=False)
    r0 = render_with("pallas", g, cam, base)
    g0 = loss_and_grads("pallas", g, cam, base)
    names = ["color", "position", "log_scaling", "alpha_logit", "heuristics"]
    for variant in (dict(base, kernel_basis=True),
                    dict(base, cumprod_scan=True)):
        rv = render_with("pallas", g, cam, variant)
        np.testing.assert_allclose(rv.image, r0.image, atol=2e-4)
        np.testing.assert_allclose(rv.alpha, r0.alpha, atol=2e-4)
        gv = loss_and_grads("pallas", g, cam, variant)
        for name, a, b in zip(names, g0, gv):
            a, b = np.asarray(a), np.asarray(b)
            scale = max(np.abs(a).max(), 1e-6)
            np.testing.assert_allclose(b, a, atol=2e-3 * scale, err_msg=name)


def test_compacted_backward_parity():
    g, cam, config = setup(n=120, seed=3, grad_bf16_pack=False)
    gd = loss_and_grads("dense", g, cam, config)
    config.update(max_instances=2048, max_render_instances=512)
    gp = loss_and_grads("pallas", g, cam, config)
    names = ["color", "position", "log_scaling", "alpha_logit", "heuristics"]
    for name, a, b in zip(names, gd, gp):
        a, b = np.asarray(a), np.asarray(b)
        scale = max(np.abs(a).max(), 1e-6)
        np.testing.assert_allclose(b, a, atol=2e-3 * scale, err_msg=name)


def test_saturation_compaction_parity():
    """max_sat_instances: the backward streams only each tile's
    forward-consumed chunk prefix. Instances past the early-exit get
    exactly zero gradient from the kernel, so outputs are bit-identical and
    gradients match to ~1 ulp (the compensated segmented reduction's block
    partition depends on the static stream length, regrouping f32 sums at
    the 2^-48 level) when the stream fits."""
    g, cam, config = setup(n=200, seed=7, grad_bf16_pack=False)
    # deep opaque stacks so saturation genuinely truncates several chunks
    g = g.replace(alpha_logit=g.alpha_logit + 4.0)
    base = dict(config, max_instances=2048, max_render_instances=1024)
    sat = dict(base, max_sat_instances=1024)

    r0 = render_with("pallas", g, cam, base)
    r1 = render_with("pallas", g, cam, sat)
    np.testing.assert_array_equal(r0.image, r1.image)
    np.testing.assert_array_equal(r0.points.visibility, r1.points.visibility)
    assert int(r1.clipped_instances) == 0
    assert int(r1.sat_demand) > 0

    g0 = loss_and_grads("pallas", g, cam, base)
    g1 = loss_and_grads("pallas", g, cam, sat)
    names = ["color", "position", "log_scaling", "alpha_logit", "heuristics"]
    for name, a, b in zip(names, g0, g1):
        a, b = np.asarray(a), np.asarray(b)
        scale = max(np.abs(a).max(), 1e-6)
        np.testing.assert_allclose(b, a, rtol=3e-6, atol=3e-6 * scale,
                                   err_msg=name)


def test_saturation_compaction_truncates_and_bf16():
    """The sat stream must be SMALLER than the render stream on a
    saturating scene (the point of the feature), and compose with the
    bf16-packed sort payloads. bf16 packing skips the reduction's dd
    compensation (renderer.py), so the two stream lengths group f32
    partial sums differently — agreement is at bf16-noise scale
    (~0.4% of an instance contribution), not ulp scale."""
    # near-opaque splats large enough to blanket whole tiles: every tile
    # saturates within a few chunks, so the consumed stream is a small
    # prefix of the thousands of rendered instances
    g, cam, config = setup(n=400, seed=11)
    g = g.replace(alpha_logit=g.alpha_logit + 6.0,
                  log_scaling=g.log_scaling + 1.5)
    base = dict(config, max_instances=8192, max_render_instances=4096,
                grad_bf16_pack=True)
    sat = dict(base, max_sat_instances=4096)
    r1 = render_with("pallas", g, cam, sat)
    assert int(r1.sat_demand) > 0
    # saturation truncation engaged: consumed stream < rendered instances
    # (chunk_size 16 granularity; the deep stacks guarantee early exits)
    assert int(r1.sat_demand) < int(r1.num_instances), (
        int(r1.sat_demand), int(r1.num_instances))

    g0 = loss_and_grads("pallas", g, cam, base)
    g1 = loss_and_grads("pallas", g, cam, sat)
    for a, b in zip(g0, g1):
        a, b = np.asarray(a), np.asarray(b)
        scale = max(np.abs(a).max(), 1e-6)
        np.testing.assert_allclose(b, a, atol=1e-3 * scale)


def test_saturation_overflow_counted():
    """A sat capacity below demand drops gradients for the overflowing
    tiles — clipped_instances must report it (never silent)."""
    g, cam, config = setup(n=200, seed=7)
    g = g.replace(alpha_logit=g.alpha_logit + 4.0)
    sat = dict(config, max_instances=2048, max_render_instances=1024,
               max_sat_instances=64)
    r = render_with("pallas", g, cam, sat)
    assert int(r.sat_demand) > 64
    assert int(r.clipped_instances) > 0


def test_grad_pack_in_kernel_bitwise():
    """grad_pack_in_kernel moves the bf16 pair-packing inside the backward
    kernel (manual RNE on u32 bits) — it must be BITWISE identical to the
    outside astype(bf16) packing path."""
    g, cam, config = setup(n=150, seed=3, grad_bf16_pack=True)
    g_out = loss_and_grads("pallas", g, cam, config)
    g_in = loss_and_grads("pallas", g, cam,
                          dict(config, grad_pack_in_kernel=True))
    names = ["color", "position", "log_scaling", "alpha_logit", "heuristics"]
    for name, a, b in zip(names, g_out, g_in):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                      err_msg=name)
    # and with saturation compaction engaged
    gs = g.replace(alpha_logit=g.alpha_logit + 4.0)
    sat = dict(config, max_instances=2048, max_render_instances=1024,
               max_sat_instances=1024)
    g_out = loss_and_grads("pallas", gs, cam, sat)
    g_in = loss_and_grads("pallas", gs, cam,
                          dict(sat, grad_pack_in_kernel=True))
    for name, a, b in zip(names, g_out, g_in):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                      err_msg=name)


def test_bwd_scan_bf16_parity():
    """bwd_scan_bf16 quantizes the backward kernel's MXU contraction inputs
    (prefix scans, cg, moments, color/prune) to bf16 with f32 accumulation.
    The forward image must be bit-identical; gradients within bf16 band."""
    g, cam, config = setup(n=120, seed=3, grad_bf16_pack=False)
    r0 = render_with("pallas", g, cam, config)
    r1 = render_with("pallas", g, cam, dict(config, bwd_scan_bf16=True))
    np.testing.assert_array_equal(r0.image, r1.image)

    g0 = loss_and_grads("pallas", g, cam, config)
    g1 = loss_and_grads("pallas", g, cam, dict(config, bwd_scan_bf16=True))
    names = ["color", "position", "log_scaling", "alpha_logit", "heuristics"]
    for name, a, b in zip(names, g0, g1):
        a, b = np.asarray(a), np.asarray(b)
        scale = max(np.abs(a).max(), 1e-6)
        np.testing.assert_allclose(b, a, atol=2e-2 * scale, err_msg=name)
    # compose with the moments path too (the production combination)
    g2 = loss_and_grads("pallas", g, cam,
                        dict(config, bwd_scan_bf16=True, bwd_moments=True))
    for name, a, b in zip(names, g0, g2):
        a, b = np.asarray(a), np.asarray(b)
        scale = max(np.abs(a).max(), 1e-6)
        np.testing.assert_allclose(b, a, atol=2e-2 * scale, err_msg=name)


def test_fwd_scan_bf16_parity():
    """fwd_scan_bf16 quantizes the forward transmittance scan's log lanes
    to bf16: the image must stay within ~0.5% of the f32 path."""
    g, cam, config = setup(n=120, seed=3)
    r0 = render_with("pallas", g, cam, config)
    r1 = render_with("pallas", g, cam, dict(config, fwd_scan_bf16=True))
    np.testing.assert_allclose(r1.image, r0.image, atol=6e-3)
    np.testing.assert_allclose(r1.alpha, r0.alpha, atol=6e-3)


def test_bwd_moments_parity():
    """bwd_moments reduces the backward's position/conic/opacity gradients
    as one MXU moments contraction instead of six VPU multiply+reduce
    chains — same math up to matmul association (~1e-5 relative)."""
    g, cam, config = setup(n=150, seed=3, grad_bf16_pack=False)
    g0 = loss_and_grads("pallas", g, cam, config)
    g1 = loss_and_grads("pallas", g, cam, dict(config, bwd_moments=True))
    names = ["color", "position", "log_scaling", "alpha_logit", "heuristics"]
    for name, a, b in zip(names, g0, g1):
        a, b = np.asarray(a), np.asarray(b)
        scale = max(np.abs(a).max(), 1e-6)
        np.testing.assert_allclose(b, a, atol=1e-4 * scale, err_msg=name)


@pytest.mark.parametrize("exit_bands", [2, 4])
def test_exit_bands_forward_parity(exit_bands):
    # banded early exit drops only contributions bounded by
    # T <= transmittance_threshold — same approximation class as the
    # tile-level exit, so the dense-oracle tolerance is unchanged
    g, cam, config = setup(n=150, seed=1)
    r_dense = render_with("dense", g, cam, config)
    r_band = render_with("pallas", g, cam,
                         dict(config, exit_bands=exit_bands))
    np.testing.assert_allclose(r_band.image, r_dense.image, atol=3e-4)
    np.testing.assert_allclose(r_band.alpha, r_dense.alpha, atol=3e-4)
    np.testing.assert_allclose(
        r_band.points.visibility, r_dense.points.visibility, atol=3e-4)
    np.testing.assert_allclose(
        r_band.median_ndc_image, r_dense.median_ndc_image, atol=1e-4)


def test_exit_bands_backward_parity():
    # gradients of the banded kernel vs the dense oracle; the backward
    # replays the identical band-death predicate, so banded fwd/bwd are
    # mutually consistent and oracle-close
    g, cam, config = setup(n=120, seed=3, grad_bf16_pack=False)
    gd = loss_and_grads("dense", g, cam, config)
    gb = loss_and_grads("pallas", g, cam, dict(config, exit_bands=4))
    names = ["color", "position", "log_scaling", "alpha_logit", "heuristics"]
    for name, a, b in zip(names, gd, gb):
        a, b = np.asarray(a), np.asarray(b)
        scale = max(np.abs(a).max(), 1e-6)
        np.testing.assert_allclose(b, a, atol=3e-3 * scale, err_msg=name)


def test_exit_bands_with_saturation_and_moments():
    # the production stack: banded exit + saturation compaction +
    # moments reductions + kernel-side bf16 pack, against the unbanded
    # pallas kernel at the same config (band-dropped contributions are
    # the only difference; opaque scene saturates fast)
    g, cam, config = setup(n=150, seed=7, grad_bf16_pack=True,
                           bwd_moments=True, max_sat_instances=1024,
                           grad_pack_in_kernel=True)
    g = g.replace(alpha_logit=g.alpha_logit + 4.0)  # opaque -> saturation
    g1 = loss_and_grads("pallas", g, cam, config)
    g4 = loss_and_grads("pallas", g, cam, dict(config, exit_bands=4))
    for name, a, b in zip(["color", "position", "log_scaling",
                           "alpha_logit", "heuristics"], g1, g4):
        a, b = np.asarray(a), np.asarray(b)
        scale = max(np.abs(a).max(), 1e-6)
        np.testing.assert_allclose(b, a, atol=3e-3 * scale, err_msg=name)
