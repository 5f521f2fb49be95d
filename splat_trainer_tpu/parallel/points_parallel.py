"""Multi-chip point sharding for city-scale scenes (SURVEY.md §2.4 item (b),
§5.7; BASELINE.md config 5).

Camera data-parallelism (data_parallel.py) replicates the whole scene on
every chip — at city scale (tens of millions of splats) the parameter +
optimizer-moment pytree no longer fits one chip's HBM. This module shards
the *points* instead, over a `points` mesh axis, and turns one training
step into a distributed transpose:

    phase 1 (owner compute, sharded N/D):  each chip evaluates MLP colors
        and projects its point shard against ALL B = D cameras of the batch
        -> (B, C/D) screen-space gaussians.
    phase 2 (all_to_all over ICI):         the (camera, shard) layout is
        transposed so chip b holds EVERY shard projected to camera b — the
        full point set for one camera, ready to composite.
    phase 3 (per-chip rasterize):          chip b composites camera b with
        the unchanged Pallas/dense kernels and computes its image loss.
    phase 4 (reverse, by autodiff):        `jax.grad` differentiates through
        the collective — the all_to_all transposes back, routing every
        camera's gradient contribution to the owning shard; replicated
        leaves (color MLP, GLO, poses) take one psum.

Compute per chip is the same as camera-DP (one camera's rasterization, N
projections spread as D x N/D), but parameters, optimizer moments, and
per-point statistics are all N/D per chip — memory scales out linearly
with the mesh. Exchanged payload is 16 f32 per point per step, riding ICI.

Densification under the points axis is *per-shard*: each shard prunes and
splits inside its own capacity slab against an occupancy-proportional
share of the global target (deterministic — per-shard RNG folds in the
shard index; no cross-chip point migration; see `make_pp_densify`).
Initial occupancy is balanced by dealing capacity slots round-robin to
shards (`interleave_permutation` — slot order is semantically free). The
reference has no distributed anything (SURVEY.md §2.4) — this design is
TPU-native, not a port.

Composable with camera-DP on a 2D mesh ("cameras", "points"): shard_grads
here is already written per-shard, so wrapping both axes is a spec change
(documented, not yet wired into the Trainer).
"""

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from splat_trainer_tpu.controller.point_state import PointState
from splat_trainer_tpu.core.types import CameraParams, Gaussians2D, RasterConfig
from splat_trainer_tpu.models import color_model as cm
from splat_trainer_tpu.models import mlp_scene as ms
from splat_trainer_tpu.ops import renderer
from splat_trainer_tpu.ops.projection import project_to_image
from splat_trainer_tpu.trainer.train_step import (
    GradBundle, TrainBatch, apply_updates, compute_losses,
)
from splat_trainer_tpu.utils.misc import saturate

POINTS_AXIS = "points"


def make_points_mesh(devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (POINTS_AXIS,))


def scene_shardings(mesh: Mesh, scene: ms.SceneState):
    """NamedSharding pytree for a SceneState: capacity-shaped leaves split
    over the points axis, everything else (color MLP, GLO, poses,
    corrector) replicated."""
    cap = scene.capacity
    pt = NamedSharding(mesh, P(POINTS_AXIS))
    rep = NamedSharding(mesh, P())

    def pick(x):
        return pt if (hasattr(x, "ndim") and x.ndim >= 1
                      and x.shape[0] == cap) else rep

    return jax.tree_util.tree_map(pick, scene)


def _spec_like(scene: ms.SceneState):
    cap = scene.capacity

    def pick(x):
        return (P(POINTS_AXIS) if (hasattr(x, "ndim") and x.ndim >= 1
                                   and x.shape[0] == cap) else P())

    return jax.tree_util.tree_map(pick, scene)


def interleave_permutation(cap: int, mesh_size: int) -> np.ndarray:
    """Capacity-slot permutation that deals slots round-robin to shards.

    Scene init packs active points into the FIRST n slots; block-sharding
    that layout puts all live points on a few shards. Slot order is
    semantically free, so dealing old slot i to shard (i % D) balances the
    initial occupancy. new[k] = old[perm[k]]."""
    if cap % mesh_size != 0:
        raise ValueError(f"capacity {cap} % mesh {mesh_size} != 0")
    return np.arange(cap).reshape(cap // mesh_size, mesh_size).T.reshape(-1)


def permute_capacity(tree, cap: int, perm: np.ndarray):
    """Apply a slot permutation to every capacity-shaped leaf of a pytree."""
    idx = jnp.asarray(perm)

    def pick(x):
        if hasattr(x, "ndim") and x.ndim >= 1 and x.shape[0] == cap:
            return x[idx]
        return x

    return jax.tree_util.tree_map(pick, tree)


def make_pp_densify(mesh: Mesh, scene_template: ms.SceneState,
                    densify_local, donate: bool = True):
    """Wrap a per-slab densify function in shard_map: each shard splits/
    prunes INSIDE its own capacity slab against an occupancy-proportional
    share of the global target — no full-capacity gather ever materializes
    (the global-jit fallback made GSPMD replicate capacity-shaped arrays
    on every chip, defeating the memory scaling PP exists for).

    `densify_local(scene_l, pstate_l, key, t, target_points)` is the
    single-device densify (controller.target.densify_device partial).
    Deterministic: per-shard RNG = fold_in(key, shard index); per-shard
    target = round(global_target * n_local / n_global).
    """
    cap = scene_template.capacity

    def local_densify(scene_l, pstate_l, key, t, target_points):
        my = jax.lax.axis_index(POINTS_AXIS)
        key_l = jax.random.fold_in(key, my)
        n_l = scene_l.active.sum()
        n_g = jnp.maximum(jax.lax.psum(n_l, POINTS_AXIS), 1)
        target_l = jnp.round(
            target_points.astype(jnp.float32) * n_l / n_g).astype(jnp.int32)
        scene_l, pstate_l, metrics = densify_local(
            scene_l, pstate_l, key_l, t=t, target_points=target_l)
        metrics = {k: jax.lax.psum(v, POINTS_AXIS)
                   for k, v in metrics.items()}
        return scene_l, pstate_l, metrics

    scene_spec = _spec_like(scene_template)
    pstate_spec = jax.tree_util.tree_map(
        lambda _: P(POINTS_AXIS), PointState.new_zeros(cap))
    sharded = shard_map(
        local_densify, mesh=mesh,
        in_specs=(scene_spec, pstate_spec, P(), P(), P()),
        out_specs=(scene_spec, pstate_spec, P()),
        check_rep=False)
    jitted = jax.jit(sharded, donate_argnums=(0, 1) if donate else ())

    def call(scene, pstate, key, t, target_points):
        # keyword-friendly facade (shard_map's wrapper is positional-only)
        return jitted(scene, pstate, key, t, target_points)

    return call


def make_local_grads(
    D: int,
    *,
    scene_config: ms.MLPSceneConfig,
    raster_config: RasterConfig,
    image_size: Tuple[int, int],
    ssim_levels: int = 3,
):
    """Per-shard gradient phase of the point-sharded step (the body that
    runs inside shard_map). `D` is the size of the POINTS mesh axis; the
    batch argument is the axis-local camera set (the whole batch on a 1D
    points mesh; one camera-row's slice on a 2D cameras x points mesh —
    every collective here names POINTS_AXIS only, so the same body serves
    both)."""

    def local_grads(scene_l: ms.SceneState, batch: TrainBatch, hyper: Dict):
        """Runs per-shard inside shard_map; scene_l is the local C/D slab."""
        B = batch.images.shape[0]
        assert B % D == 0, (
            f"points-parallel needs batch ({B}) % points axis ({D}) == 0")
        k = B // D                     # cameras composited per chip
        cap_l = scene_l.capacity
        my = jax.lax.axis_index(POINTS_AXIS)

        if batch.images.dtype == jnp.uint8:
            batch = batch._replace(images=batch.images.astype(jnp.float32) / 255.0)

        def loss_fn(params_l: ms.SceneGrads, heur_sink_l):
            scene_p = ms.with_params(scene_l, params_l)

            # phase 1: colors + projection of MY shard for every camera
            per_cam = []
            for b in range(B):
                camera = CameraParams(
                    T_camera_world=batch.T_camera_world[b],
                    projection=batch.projection[b],
                    near_plane=batch.near[b], far_plane=batch.far[b],
                    image_size=image_size)
                camera = ms.refined_camera(scene_p, camera, batch.image_idx[b])
                diffuse, specular = scene_config.eval_colors(
                    scene_p, camera, batch.image_idx[b])
                colors = cm.total_color(diffuse, specular)[:, :3]
                g2d = project_to_image(scene_p.gaussians(), camera,
                                       raster_config, active=scene_p.active)
                per_cam.append(dict(g2d=g2d, colors=colors,
                                    spec=jnp.abs(specular).sum(-1)))
            stacked = jax.tree_util.tree_map(
                lambda *xs: jnp.stack(xs, axis=0), *per_cam)  # (B, cap_l, ...)

            # camera-independent reg inputs: full via all_gather (AD: psum_scatter)
            opacity_l = jax.nn.sigmoid(scene_p.points["alpha_logit"][:, 0])
            scale_l = jnp.exp(scene_p.points["log_scaling"])
            opacity_f = jax.lax.all_gather(opacity_l, POINTS_AXIS, tiled=True)
            scale_f = jax.lax.all_gather(scale_l, POINTS_AXIS, tiled=True)

            # phase 2: distributed transpose — full point set for each of
            # MY k cameras. Tiled all_to_all sends chunk j (k cameras) to
            # device j; received rows are (source shard, local camera).
            def exchange(x):
                y = jax.lax.all_to_all(x, POINTS_AXIS, split_axis=0,
                                       concat_axis=0, tiled=True)
                y = y.reshape((D, k, cap_l) + y.shape[2:])
                y = jnp.moveaxis(y, 1, 0)          # (k, D, cap_l, ...)
                # flatten shards to the global (shard-major) point order
                return y.reshape((k, D * cap_l) + y.shape[3:])

            full = jax.tree_util.tree_map(exchange, stacked)
            heur_full = exchange(heur_sink_l)

            total = jnp.float32(0.0)
            metrics_acc = None
            vis_ks, in_view_ks, scale_ks = [], [], []
            for i in range(k):
                ci = my * k + i                     # my i-th camera's index
                g2d_f: Gaussians2D = jax.tree_util.tree_map(
                    lambda x: x[i], full["g2d"])
                camera_my = CameraParams(
                    T_camera_world=jnp.take(batch.T_camera_world, ci, axis=0),
                    projection=jnp.take(batch.projection, ci, axis=0),
                    near_plane=jnp.take(batch.near, ci, axis=0),
                    far_plane=jnp.take(batch.far, ci, axis=0),
                    image_size=image_size)

                # phase 3: composite this camera over the full set
                rendering = renderer.render_projected(
                    g2d_f, full["colors"][i], camera_my, raster_config,
                    heur_sink=heur_full[i])
                image = scene_config.post_activation(rendering.image)
                ref = jnp.take(batch.images, ci, axis=0)
                loss_img, metrics = compute_losses(image, ref, hyper,
                                                   ssim_levels)

                # reg (visibility-weighted, reference mlp_scene.py:247-288)
                # over the full exchanged set for this camera
                vis = rendering.points.visibility
                visible = vis > 0.0
                n_vis = jnp.maximum(visible.sum(), 1).astype(jnp.float32)
                w = jnp.where(visible, vis, 0.0)
                depths = jnp.maximum(jnp.abs(g2d_f.depth), 1e-6)
                norm_scale = (scale_f ** 2).sum(-1) / depths ** 2
                aspect = scale_f.max(-1) / jnp.maximum(scale_f.min(-1), 1e-12)
                regs = {
                    "scale": (norm_scale * w).sum() / n_vis,
                    "opacity": (saturate(opacity_f, gain=4.0, k=2.0)
                                * norm_scale * w).sum() / n_vis,
                    "aspect": (aspect * w).sum() / n_vis,
                    "specular": (full["spec"][i] * w).sum() / n_vis,
                }
                reg_w = {r: regs[r] * hyper["reg"][r]
                         for r in regs if r in hyper["reg"]}
                total = total + loss_img + sum(reg_w.values())

                metrics["reg"] = reg_w
                metrics["num_visible"] = rendering.points.num_visible
                metrics["clipped"] = (rendering.clipped_instances
                                      if rendering.clipped_instances is not None
                                      else jnp.int32(0))
                occ_i = (rendering.num_instances
                         if rendering.num_instances is not None
                         else jnp.int32(0),
                         rendering.instance_demand
                         if rendering.instance_demand is not None
                         else jnp.int32(0),
                         rendering.sat_demand
                         if rendering.sat_demand is not None
                         else jnp.int32(0))
                occupancy = occ_i if metrics_acc is None else (
                    jnp.maximum(occupancy[0], occ_i[0]),
                    jnp.maximum(occupancy[1], occ_i[1]),
                    jnp.maximum(occupancy[2], occ_i[2]))
                metrics_acc = (metrics if metrics_acc is None
                               else jax.tree_util.tree_map(
                                   lambda a, b: a + b, metrics_acc, metrics))
                vis_ks.append(jax.lax.stop_gradient(vis))
                in_view_ks.append(rendering.points.in_view)
                scale_ks.append(jax.lax.stop_gradient(g2d_f.screen_scale))

            metrics_acc = jax.tree_util.tree_map(
                lambda x: x / k, metrics_acc)
            metrics_acc["num_instances"] = occupancy[0]
            metrics_acc["instance_demand"] = occupancy[1]
            metrics_acc["sat_demand"] = occupancy[2]
            aux = dict(
                vis_full=jnp.stack(vis_ks),          # (k, D*cap_l)
                in_view_full=jnp.stack(in_view_ks),
                screen_scale_full=jnp.stack(scale_ks),
                metrics=metrics_acc)
            return total, aux

        params = ms.trainable_params(scene_l)
        heur_sink = jnp.zeros((B, cap_l, 2), jnp.float32)
        grad_fn = jax.grad(loss_fn, argnums=(0, 1), has_aux=True)
        (grads, heur_bc), aux = grad_fn(params, heur_sink)
        heur = heur_bc.sum(axis=0)  # (cap_l, 2): all cameras' contributions

        # reverse transpose of the non-differentiated per-point statistics:
        # (k, D*cap_l) by camera -> (B, cap_l) rows = MY shard's statistics
        # in every camera of the global batch
        def unexchange(x_full):
            x = x_full.reshape((k, D, cap_l) + x_full.shape[2:])
            x = jnp.moveaxis(x, 1, 0).reshape((B, cap_l) + x_full.shape[2:])
            return jax.lax.all_to_all(x, POINTS_AXIS, split_axis=0,
                                      concat_axis=0, tiled=True)

        vis_bc = unexchange(aux["vis_full"])                   # (B, cap_l)
        in_view_bc = unexchange(aux["in_view_full"])
        scale_bc = unexchange(aux["screen_scale_full"])        # (B, cap_l, 2)

        vis_acc = vis_bc.sum(axis=0)
        in_view_any = in_view_bc.any(axis=0)
        scale_max = jnp.max(
            jnp.where(in_view_bc[..., None], scale_bc, 0.0), axis=0)

        glo_rows = jnp.zeros((scene_l.glo_table.shape[0],), bool
                             ).at[batch.image_idx].set(True)

        # combine: sharded point grads are already complete (reverse
        # all_to_all accumulated every camera); replicated leaves need a psum
        def psum(x):
            return jax.lax.psum(x, POINTS_AXIS)

        grads = grads.replace(
            color_params=jax.tree_util.tree_map(psum, grads.color_params),
            glo_table=psum(grads.glo_table),
            pose_dq=psum(grads.pose_dq), pose_dt=psum(grads.pose_dt),
            corrector_grids=(None if grads.corrector_grids is None
                             else psum(grads.corrector_grids)))
        # occupancy metrics are worst-VIEW maxima (they size the instance
        # bucketing) — reduce across chips with pmax, not a mean of maxima
        m_local = dict(aux["metrics"])
        occ = {k: jax.lax.pmax(m_local.pop(k), POINTS_AXIS)
               for k in ("num_instances", "instance_demand", "sat_demand")}
        metrics = jax.tree_util.tree_map(lambda m: psum(m) / D, m_local)
        metrics.update(occ)

        return GradBundle(grads=grads, heur=heur, vis_acc=vis_acc,
                          in_view_any=in_view_any, scale_max=scale_max,
                          glo_rows=glo_rows, metrics=metrics)

    return local_grads


def make_pp_train_step(
    mesh: Mesh,
    scene_template: ms.SceneState,
    *,
    scene_config: ms.MLPSceneConfig,
    raster_config: RasterConfig,
    image_size: Tuple[int, int],
    ssim_levels: int = 3,
):
    """Build a jitted point-sharded train step.

    Requires batch size B = k * mesh size (each chip composites k cameras
    per step) and scene capacity divisible by the mesh size. Returns
    (step_fn, batch_sharding, scene_sharding, pstate_sharding).
    """
    D = mesh.size
    cap = scene_template.capacity
    if cap % D != 0:
        raise ValueError(f"capacity {cap} must divide the mesh size {D}")
    local_grads = make_local_grads(
        D, scene_config=scene_config, raster_config=raster_config,
        image_size=image_size, ssim_levels=ssim_levels)

    def shard_step(scene_l, pstate_l, batch, hyper):
        bundle = local_grads(scene_l, batch, hyper)
        return apply_updates(scene_l, pstate_l, bundle, hyper, scene_config)

    scene_spec = _spec_like(scene_template)
    pstate_spec = jax.tree_util.tree_map(
        lambda _: P(POINTS_AXIS), PointState.new_zeros(cap))
    batch_spec = jax.tree_util.tree_map(lambda _: P(), TrainBatch(
        images=0, image_idx=0, T_camera_world=0, projection=0, near=0, far=0))

    sharded = shard_map(
        shard_step, mesh=mesh,
        in_specs=(scene_spec, pstate_spec, batch_spec, P()),
        out_specs=(scene_spec, pstate_spec, P()),
        check_rep=False)

    def pp_train_step(scene, pstate, batch, hyper, key):
        del key
        return sharded(scene, pstate, batch, hyper)

    batch_sharding = jax.tree_util.tree_map(
        lambda _: NamedSharding(mesh, P()), batch_spec)
    scene_sharding = scene_shardings(mesh, scene_template)
    pstate_sharding = jax.tree_util.tree_map(
        lambda _: NamedSharding(mesh, P(POINTS_AXIS)),
        PointState.new_zeros(cap))

    return (jax.jit(pp_train_step, donate_argnums=(0, 1)),
            batch_sharding, scene_sharding, pstate_sharding)


# ---------------------------------------------------------------------------
# 2D composition: cameras x points (BASELINE.md config 5 — city scale on a
# pod: memory scales out over the points axis, throughput over the cameras
# axis)
# ---------------------------------------------------------------------------

CAMERAS_AXIS = "cameras"


def make_2d_mesh(dc: int, dp: int, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    if len(devices) < dc * dp:
        raise ValueError(f"need {dc * dp} devices, have {len(devices)}")
    grid = np.asarray(devices[:dc * dp]).reshape(dc, dp)
    return Mesh(grid, (CAMERAS_AXIS, POINTS_AXIS))


def make_dp_pp_train_step(
    mesh: Mesh,
    scene_template: ms.SceneState,
    *,
    scene_config: ms.MLPSceneConfig,
    raster_config: RasterConfig,
    image_size: Tuple[int, int],
    ssim_levels: int = 3,
):
    """Train step on a ("cameras", "points") 2D mesh.

    The batch splits over the cameras axis (each camera-row of the mesh
    handles B/Dc views); within a row, the 1D points-parallel body runs
    unchanged (its collectives name POINTS_AXIS only). Cross-row: one psum
    of the GradBundle — point grads and per-point statistics sum over
    camera rows exactly like camera-DP, so the replicated-over-cameras
    sharded state stays bitwise in sync through apply_updates.
    """
    dc = mesh.shape[CAMERAS_AXIS]
    dp = mesh.shape[POINTS_AXIS]
    cap = scene_template.capacity
    if cap % dp != 0:
        raise ValueError(f"capacity {cap} % points axis {dp} != 0")
    local_grads = make_local_grads(
        dp, scene_config=scene_config, raster_config=raster_config,
        image_size=image_size, ssim_levels=ssim_levels)

    def shard_step(scene_l, pstate_l, batch_row, hyper):
        bundle = local_grads(scene_l, batch_row, hyper)

        def csum(x):
            return jax.lax.psum(x, CAMERAS_AXIS)

        m_local = dict(bundle.metrics)
        occ = {k: jax.lax.pmax(m_local.pop(k), CAMERAS_AXIS)
               for k in ("num_instances", "instance_demand", "sat_demand")
               if k in m_local}   # worst-view maxima: pmax, not mean
        m_red = jax.tree_util.tree_map(lambda m: csum(m) / dc, m_local)
        m_red.update(occ)
        bundle = GradBundle(
            grads=jax.tree_util.tree_map(csum, bundle.grads),
            heur=csum(bundle.heur),
            vis_acc=csum(bundle.vis_acc),
            in_view_any=csum(bundle.in_view_any.astype(jnp.int32)) > 0,
            scale_max=jax.lax.pmax(bundle.scale_max, CAMERAS_AXIS),
            glo_rows=csum(bundle.glo_rows.astype(jnp.int32)) > 0,
            metrics=m_red)
        return apply_updates(scene_l, pstate_l, bundle, hyper, scene_config)

    scene_spec = _spec_like(scene_template)
    pstate_spec = jax.tree_util.tree_map(
        lambda _: P(POINTS_AXIS), PointState.new_zeros(cap))
    batch_spec = jax.tree_util.tree_map(
        lambda _: P(CAMERAS_AXIS), TrainBatch(
            images=0, image_idx=0, T_camera_world=0, projection=0,
            near=0, far=0))

    sharded = shard_map(
        shard_step, mesh=mesh,
        in_specs=(scene_spec, pstate_spec, batch_spec, P()),
        out_specs=(scene_spec, pstate_spec, P()),
        check_rep=False)

    def step(scene, pstate, batch, hyper, key):
        del key
        return sharded(scene, pstate, batch, hyper)

    batch_sharding = jax.tree_util.tree_map(
        lambda _: NamedSharding(mesh, P(CAMERAS_AXIS)), batch_spec)
    scene_sharding = scene_shardings(mesh, scene_template)
    pstate_sharding = jax.tree_util.tree_map(
        lambda _: NamedSharding(mesh, P(POINTS_AXIS)),
        PointState.new_zeros(cap))
    return (jax.jit(step, donate_argnums=(0, 1)),
            batch_sharding, scene_sharding, pstate_sharding)
