"""SH export distillation: fit per-point SH coefficients to the MLP colors.

Capability equivalent of /root/reference/splat_trainer/scene/
transfer_sh.py:16-113 (used by to_sh_gaussians, mlp_scene.py:384-398) with a
TPU-appropriate method: the fit  color(p, v) ~ sum_k basis_k(dir_pv) c_pk
is *linear* in the coefficients, so instead of the reference's SGD loop we
accumulate visibility-weighted normal equations over the training views and
solve the per-point (K x K) ridge system in closed form — one pass over the
cameras, exact least squares.
"""

from typing import Optional

import jax
import jax.numpy as jnp

from splat_trainer_tpu.cameras.camera_table import CameraTable, Label
from splat_trainer_tpu.core.types import Gaussians3D
from splat_trainer_tpu.models import color_model as cm
from splat_trainer_tpu.models import mlp_scene as ms
from splat_trainer_tpu.ops.sh import num_sh_coeffs, sh_basis


def fit_sh_features(
    positions: jnp.ndarray,            # (N, 3)
    camera_positions: jnp.ndarray,     # (V, 3)
    colors_per_view: jnp.ndarray,      # (V, N, 3) MLP colors per view
    weights_per_view: jnp.ndarray,     # (V, N) visibility weights
    sh_degree: int = 2,
    ridge: float = 1e-4,
    chunk: int = 262144,
) -> jnp.ndarray:
    """Weighted least-squares SH fit, (N, 3, K).

    Chunked over N: at the 30k run's 1M points the whole-array batched
    (N, K, K) solve hit an XLA:TPU "compile permanent error" through the
    remote compile helper (2026-08-21, write_sh_30k). Each point's normal
    equations are independent, so a host loop over fixed-size N-slices is
    exact and compiles once (same chunk shape every iteration)."""
    n_total = positions.shape[0]
    if n_total > chunk:
        outs = []
        for s in range(0, n_total, chunk):
            e = min(s + chunk, n_total)
            idx = jnp.arange(s, s + chunk) % n_total   # fixed shape; the
            # tail wraps and the wrapped rows are discarded below
            outs.append(fit_sh_features(
                positions[idx], camera_positions,
                colors_per_view[:, idx], weights_per_view[:, idx],
                sh_degree=sh_degree, ridge=ridge, chunk=chunk)[: e - s])
        return jnp.concatenate(outs, axis=0)
    k = num_sh_coeffs(sh_degree)

    def accumulate(carry, inputs):
        ata, atb = carry
        cam_pos, colors, w = inputs
        d = positions - cam_pos[None]
        d = d / jnp.maximum(jnp.linalg.norm(d, axis=-1, keepdims=True), 1e-12)
        b = sh_basis(d, sh_degree)                          # (N, K)
        wb = b * w[:, None]
        ata = ata + wb[:, :, None] * b[:, None, :]          # (N, K, K)
        atb = atb + wb[:, :, None] * colors[:, None, :]     # (N, K, 3)
        return (ata, atb), None

    n = positions.shape[0]
    init = (jnp.zeros((n, k, k)), jnp.zeros((n, k, 3)))
    (ata, atb), _ = jax.lax.scan(
        accumulate, init, (camera_positions, colors_per_view, weights_per_view))

    ata = ata + ridge * jnp.eye(k)[None]
    coeffs = jnp.linalg.solve(ata, atb)                     # (N, K, 3)
    return jnp.swapaxes(coeffs, 1, 2)                       # (N, 3, K)


def scene_to_sh_gaussians(
    scene: ms.SceneState,
    config: ms.MLPSceneConfig,
    camera_table: CameraTable,
    sh_degree: int = 2,
    max_views: int = 64,
    active_only: bool = True,
    raster_config=None,
    render_scale: float = 0.5,
) -> Gaussians3D:
    """Distill the MLP color model into standard SH gaussians
    (reference evaluate_sh_features / to_sh_gaussians, mlp_scene.py:384-398).

    View weights are *rendered* visibility at `render_scale` resolution
    (matching ref transfer_sh.py:53-113): occluded points contribute nothing
    to the fit from views that can't see them, so exported SH doesn't get
    confidently wrong colors on back sides.
    """
    import numpy as np

    from splat_trainer_tpu.core.types import CameraParams, RasterConfig

    if raster_config is None:
        raster_config = RasterConfig()

    cams = camera_table.cameras
    train = np.asarray(cams.has_label(Label.Training)).nonzero()[0]
    if len(train) > max_views:
        train = train[np.linspace(0, len(train) - 1, max_views).astype(int)]
    train = jnp.asarray(train)

    positions = scene.points["position"]
    cam_pos_all = cams.positions

    w_img, h_img = camera_table.image_size
    small_size = (max(int(w_img * render_scale), 8),
                  max(int(h_img * render_scale), 8))

    @jax.jit
    def view_fn(scene, T, proj, near, far, idx):
        camera = CameraParams(T_camera_world=T, projection=proj * render_scale,
                              near_plane=near, far_plane=far,
                              image_size=small_size)
        diffuse, specular = ms.eval_scene_colors(scene, config, camera, idx)
        total = cm.post_activation(
            cm.total_color(diffuse, specular), config.color_model)
        rendering = ms.renderer.render_gaussians(
            scene.gaussians(), total, camera, raster_config,
            active=scene.active)
        return total, rendering.points.visibility

    colors, weights = [], []
    for idx in np.asarray(train):
        T, proj, near, far = camera_table.gather_batch(jnp.asarray([int(idx)]))
        total, vis = view_fn(scene, T[0], proj[0], near[0], far[0],
                             jnp.asarray(int(idx)))
        colors.append(total)
        w = vis
        if active_only:
            w = w * scene.active
        weights.append(w)

    colors_v = jnp.stack(colors)
    weights_v = jnp.stack(weights)
    feature = fit_sh_features(
        positions, cam_pos_all[train], colors_v, weights_v, sh_degree)

    # DC normalization: solve() gives basis-space coefficients directly,
    # which is exactly the 3DGS ply convention (color = sum b_k c_k).
    g = Gaussians3D(
        position=positions,
        rotation=scene.points["rotation"],
        log_scaling=scene.points["log_scaling"],
        alpha_logit=scene.points["alpha_logit"],
        feature=feature,
    )
    if active_only:
        keep = np.asarray(scene.active)
        g = jax.tree_util.tree_map(lambda x: x[keep], g)
    return g
