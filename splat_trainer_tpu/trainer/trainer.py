"""Training orchestration: init, hot loop, evaluation, checkpoints, aborts.

Capability equivalent of /root/reference/splat_trainer/trainer/
trainer.py:71-713, restructured around one jitted train step
(trainer/train_step.py): the host loop only selects views, feeds batches,
runs the (rare) densify program, evaluates, checkpoints, and watches for
failure (SURVEY.md §7.1 decision 1).
"""

import functools
import json
import os
import time
from collections import deque
from dataclasses import replace
from pathlib import Path
from types import SimpleNamespace
from typing import Callable, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from splat_trainer_tpu.config import Progress
from splat_trainer_tpu.controller.point_state import PointState
from splat_trainer_tpu.controller.target import TargetConfig, densify_device
from splat_trainer_tpu.controller.mcmc import (
    MCMCConfig, mcmc_noise_step, mcmc_prune_split,
)
from splat_trainer_tpu.core.types import CameraParams, Rendering
from splat_trainer_tpu.data.dataset import Dataset, ImageView
from splat_trainer_tpu.logger import Logger, LoggerWithState, NullLogger
from splat_trainer_tpu.models import mlp_scene as ms
from splat_trainer_tpu.trainer import checkpoint as ckpt
from splat_trainer_tpu.trainer import exception
from splat_trainer_tpu.trainer.config import TrainConfig
from splat_trainer_tpu.trainer.evaluation import Evaluation, eval_image_device
from splat_trainer_tpu.trainer.init import get_initial_gaussians
from splat_trainer_tpu.trainer.loading import ThreadedLoader
from splat_trainer_tpu.trainer.train_step import TrainBatch, make_hyper, train_step
from splat_trainer_tpu.utils.misc import Heap, format_dict
from splat_trainer_tpu.visibility import cluster


class TrainerState:
    Stopped = "stopped"
    Training = "training"
    Paused = "paused"


FINE_RUNGS = (8, 9, 10, 11, 12, 13, 14, 15)    # eighth steps
COARSE_RUNGS = (8, 12)                          # x1.5 steps


def capacity_ladder(ceiling: int, chunk: int, numerators=FINE_RUNGS):
    """Instance-capacity rungs in [chunk*64, ceiling], chunk multiples.

    The single source of truth for bucket sizing — the Trainer's growth
    (coarse)/shrink (fine) paths and bench.py's steady-state capacity
    pick all derive from here so they cannot drift apart."""
    vals = {ceiling}
    v = max(chunk * 64, 1 << 13)
    while v < ceiling:
        for num in numerators:
            r = v * num // 8
            if r < ceiling and r % chunk == 0:
                vals.add(r)
        v *= 2
    return sorted(vals)


def check_finite_tree(tree, name: str):
    """NaN sweep over a pytree (reference count_nonfinite, trainer.py:580-586)."""
    bad = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        if hasattr(leaf, "dtype") and jnp.issubdtype(leaf.dtype, jnp.floating):
            n = int(jnp.size(leaf) - jnp.isfinite(leaf).sum())
            if n:
                bad[f"{name}{jax.tree_util.keystr(path)}"] = n
    return bad


class Trainer:
    def __init__(self, config: TrainConfig, scene: ms.SceneState,
                 pstate: PointState, dataset: Dataset, logger: Logger,
                 controller, view_selection, step: int = 0,
                 evaluation_log: Optional[list] = None,
                 view_clustering: Optional[cluster.ViewClustering] = None):
        self.config = config
        self.scene = scene
        self.pstate = pstate
        self.dataset = dataset
        self.camera_table = dataset.camera_table
        self.controller = controller
        self.view_selection = view_selection

        if not isinstance(logger, LoggerWithState):
            logger = LoggerWithState(logger)
        self.logger = logger

        self.step = step
        self.last_checkpoint = step
        self.state = TrainerState.Stopped
        self.view_clustering = view_clustering
        self.evaluation_log = evaluation_log or []

        self.running_time: deque = deque(maxlen=10)
        self.last_time = None
        self.loader = None
        self.pbar = None
        self.on_update: List[Callable] = []   # viewer hooks (pydispatch equiv)

        self._rng = np.random.RandomState(config.seed)
        self._key = jax.random.PRNGKey(config.seed)

        self.mesh = None
        self._batch_sharding = None
        if config.dp and config.pp:
            # 2D cameras x points mesh (BASELINE config 5): batch splits
            # over camera rows, scene shards over the points axis within
            # each row (replicated across rows)
            from splat_trainer_tpu.parallel import points_parallel as ppar
            devices = jax.devices()
            dc = config.dp_devices or 1
            dp_ = config.pp_devices or (len(devices) // dc)
            self.mesh = ppar.make_2d_mesh(dc, dp_, devices)
            bs = getattr(config.view_selection, "batch_size", 1)
            if bs % (dc * dp_) != 0:
                raise ValueError(
                    f"dp x pp needs batch_size ({bs}) % devices "
                    f"({dc}x{dp_}) == 0")
            if scene.capacity % dp_ != 0:
                raise ValueError(
                    f"dp x pp needs capacity ({scene.capacity}) % points "
                    f"axis ({dp_}) == 0")
            (self._train_step, self._batch_sharding, self._scene_sharding,
             self._pstate_sharding) = ppar.make_dp_pp_train_step(
                self.mesh, self.scene,
                scene_config=config.scene,
                raster_config=config.raster_config(),
                image_size=self.camera_table.image_size,
                ssim_levels=config.ssim_levels)
            cap = self.scene.capacity
            perm = ppar.interleave_permutation(cap, dp_)
            self.scene = ppar.permute_capacity(self.scene, cap, perm)
            self.pstate = ppar.permute_capacity(self.pstate, cap, perm)
            self.scene = jax.device_put(self.scene, self._scene_sharding)
            self.pstate = jax.device_put(self.pstate, self._pstate_sharding)
        elif config.dp:
            from splat_trainer_tpu.parallel import data_parallel as dpar
            devices = jax.devices()
            if config.dp_devices is not None:
                devices = devices[:config.dp_devices]
            self.mesh = dpar.make_camera_mesh(devices)
            bs = getattr(config.view_selection, "batch_size", 1)
            if bs % self.mesh.size != 0:
                raise ValueError(
                    f"dp needs batch_size ({bs}) % mesh size "
                    f"({self.mesh.size}) == 0 (k images per chip)")
            self._train_step, self._batch_sharding, self._rep_sharding = (
                dpar.make_dp_train_step(
                    self.mesh,
                    scene_config=config.scene,
                    raster_config=config.raster_config(),
                    image_size=self.camera_table.image_size,
                    ssim_levels=config.ssim_levels))
            # replicate training state across the mesh; densify and the
            # optimizer then run identically on every chip (one psum per
            # step is the only cross-chip traffic)
            self.scene = jax.device_put(self.scene, self._rep_sharding)
            self.pstate = jax.device_put(self.pstate, self._rep_sharding)
        elif config.pp:
            from splat_trainer_tpu.parallel import points_parallel as ppar
            devices = jax.devices()
            if config.pp_devices is not None:
                devices = devices[:config.pp_devices]
            self.mesh = ppar.make_points_mesh(devices)
            bs = getattr(config.view_selection, "batch_size", 1)
            if bs % self.mesh.size != 0:
                raise ValueError(
                    f"pp needs batch_size ({bs}) % mesh size "
                    f"({self.mesh.size}) == 0 (k cameras composited per chip)")
            if scene.capacity % self.mesh.size != 0:
                raise ValueError(
                    f"pp needs capacity ({scene.capacity}) % mesh size "
                    f"({self.mesh.size}) == 0")
            (self._train_step, self._batch_sharding, self._scene_sharding,
             self._pstate_sharding) = ppar.make_pp_train_step(
                self.mesh, self.scene,
                scene_config=config.scene,
                raster_config=config.raster_config(),
                image_size=self.camera_table.image_size,
                ssim_levels=config.ssim_levels)
            # balance shard occupancy (init packs actives into low slots;
            # slot order is semantically free), then shard the capacity-
            # shaped state N/D per chip. Densify runs PER-SHARD inside
            # shard_map (see _build_controller_fns); eval runs under plain
            # jit and state is re-pinned to the point sharding afterwards
            cap = self.scene.capacity
            perm = ppar.interleave_permutation(cap, self.mesh.size)
            self.scene = ppar.permute_capacity(self.scene, cap, perm)
            self.pstate = ppar.permute_capacity(self.pstate, cap, perm)
            self.scene = jax.device_put(self.scene, self._scene_sharding)
            self.pstate = jax.device_put(self.pstate, self._pstate_sharding)
        else:
            self._train_step = self._bucketed_train_step
            self._step_cache = {}
            self._bucket = self._initial_bucket()
            self._shrink_streak = 0
        self._densify = self._build_controller_fns()
        self._grad_fn = None  # details-mode gradient probe (built lazily)

        # whole per-view evaluation (render + metrics + cluster features) as
        # one compiled program; point_labels/num_clusters keyed statically
        self._num_clusters = min(config.vis_clusters, scene.capacity)
        self._eval_render = jax.jit(functools.partial(
            eval_image_device,
            scene_config=config.scene,
            raster_config=config.raster_config(render_median_depth=True),
            image_size=self.camera_table.image_size,
            num_clusters=self._num_clusters,
        ))

    # -- construction -------------------------------------------------------

    @staticmethod
    def initialize(config: TrainConfig, dataset: Dataset, logger: Logger):
        key = jax.random.PRNGKey(config.seed)
        k_init, k_scene = jax.random.split(key)

        initial = get_initial_gaussians(
            config.cloud_init, dataset.camera_table, dataset.pointcloud(), k_init)
        scene = config.scene.init_scene(
            k_scene, initial, dataset.camera_table.num_images,
            capacity=config.capacity)

        from splat_trainer_tpu.color_corrector import BilateralCorrectorConfig
        if isinstance(config.color_corrector, BilateralCorrectorConfig):
            from splat_trainer_tpu.color_corrector.bilateral import identity_grids
            from splat_trainer_tpu.optim import row_adam_init
            cc = config.color_corrector
            grids = identity_grids(dataset.camera_table.num_images,
                                   cc.grid_width, cc.grid_height, cc.grid_luma)
            scene = scene.replace(
                corrector_grids=grids,
                corrector_opt=row_adam_init(
                    grids.reshape(grids.shape[0], -1)))
        pstate = PointState.new_zeros(scene.capacity)

        progress = Progress(step=0, total_steps=config.total_steps)
        controller = config.controller.make_controller(
            initial.num_points, config.target_points, progress)
        view_selection = config.view_selection.create(
            dataset.camera_table.train_indices(), seed=config.seed)

        trainer = Trainer(config, scene, pstate, dataset, logger, controller,
                          view_selection)

        if config.save_output:
            paths = trainer.paths()
            trainer.write_cameras(paths.cameras)
        return trainer

    @staticmethod
    def from_state_dict(config: TrainConfig, dataset: Dataset, logger: Logger,
                        state: dict) -> "Trainer":
        scene, pstate, host = state["scene"], state["pstate"], state["host"]
        step = host["step"]
        progress = Progress(step=step, total_steps=config.total_steps)
        controller = config.controller.make_controller(
            host["controller"].get("start_points", int(scene.active.sum())),
            config.target_points, progress)
        controller.load_state_dict(host["controller"])
        view_selection = config.view_selection.create(
            dataset.camera_table.train_indices(), seed=config.seed)
        view_selection.load_state_dict(host["view_selection"])

        vc = None
        if host.get("view_clustering") is not None:
            vc = cluster.ViewClustering.from_state_dict(host["view_clustering"])

        return Trainer(config, scene, pstate, dataset, logger, controller,
                       view_selection, step=step,
                       evaluation_log=host.get("evaluation_log"),
                       view_clustering=vc)

    def state_dict(self) -> dict:
        host = dict(
            step=self.step,
            controller=self.controller.state_dict(),
            view_selection=self.view_selection.state_dict(),
            view_clustering=(self.view_clustering.state_dict()
                             if self.view_clustering else None),
            evaluation_log=self.evaluation_log,
        )
        return dict(scene=self.scene, pstate=self.pstate, host=host)

    def clone(self) -> "Trainer":
        return Trainer.from_state_dict(self.config, self.dataset,
                                       self.logger, self.state_dict())

    def replace(self, **config_changes) -> "Trainer":
        config = replace(self.config, **config_changes)
        return Trainer.from_state_dict(config, self.dataset, self.logger,
                                       self.state_dict())

    def update_config(self, **kwargs):
        """Live config mutation (viewer hook; reference splatview.py:170-187).

        Renderer-affecting keys must invalidate every compiled program that
        baked the old RasterConfig in statically — otherwise the toggle
        changes self.config but not the next rendered/trained frame."""
        self.config = replace(self.config, **kwargs)
        if "controller" in kwargs:
            self._densify = self._build_controller_fns()
        renderer_keys = {"antialias", "blur_cov", "tile_size",
                         "max_instances", "max_render_instances",
                         "chunk_size", "raster_backend", "grad_bf16_pack",
                         "kernel_basis", "bwd_moments", "tiles_per_block",
                         "saturation_cull"}
        if renderer_keys & set(kwargs):
            if self.mesh is not None:
                # the DP/PP/2D-mesh train step is built once in __init__
                # with the old RasterConfig baked in; silently keeping it
                # would make training and eval diverge after the toggle
                raise ValueError(
                    "update_config cannot change renderer settings "
                    f"({sorted(renderer_keys & set(kwargs))}) on a "
                    "multi-chip Trainer — restart with the new config")
            if getattr(self, "_step_cache", None) is not None:
                self._step_cache = {}
                # re-anchor the bucket to the NEW capacities, else the next
                # step recompiles at the stale sizes
                self._bucket = self._initial_bucket()
                self._shrink_streak = 0
            self._eval_render = jax.jit(functools.partial(
                eval_image_device,
                scene_config=self.config.scene,
                raster_config=self.config.raster_config(
                    render_median_depth=True),
                image_size=self.camera_table.image_size,
                num_clusters=self._num_clusters,
            ))

    # -- paths / io ----------------------------------------------------------

    @property
    def output_path(self) -> Path:
        return Path.cwd()

    def paths(self, step: Optional[int] = None) -> SimpleNamespace:
        step = self.step if step is None else step
        paths = dict(
            checkpoint=self.output_path / "checkpoint" / f"checkpoint_{step}",
            point_cloud=(self.output_path / "point_cloud"
                         / f"iteration_{step}" / "point_cloud.ply"),
            cameras=self.output_path / "cameras.json",
            workspace=self.output_path,
        )
        for p in paths.values():
            p.parent.mkdir(parents=True, exist_ok=True)
        return SimpleNamespace(**paths)

    def write_cameras(self, path):
        from splat_trainer_tpu.cameras.camera_table import camera_json
        with open(path, "w") as f:
            json.dump(camera_json(self.camera_table), f, indent=2, sort_keys=True)

    def write_checkpoint(self):
        paths = self.paths()
        ckpt.save_checkpoint(paths.checkpoint, self.state_dict())
        try:
            from splat_trainer_tpu.models.io import write_gaussians
            write_gaussians(paths.point_cloud, self.sh_gaussians(), with_sh=True)
        except Exception as e:
            self.print(f"ply export failed: {e}")
        self.print(f"checkpoint saved to {paths.checkpoint}")

    def sh_gaussians(self):
        g = self.config.scene.to_sh_gaussians(
            self.scene, self.camera_table, self.config.raster_config())
        return self.dataset.to_original.transform_gaussians(g)

    # -- rendering / evaluation ----------------------------------------------

    @property
    def progress(self) -> Progress:
        return Progress(step=self.step, total_steps=self.config.total_steps,
                        logging_step=self.is_logging_step)

    @property
    def is_logging_step(self) -> bool:
        return self.step % self.config.log_interval == 0

    def camera_params(self, idx: int) -> CameraParams:
        return self.camera_table.camera_params(idx)

    def render(self, camera: CameraParams, image_idx: Optional[int] = None,
               **options) -> Rendering:
        rcfg = self.config.raster_config(
            render_median_depth=options.get("render_median_depth", False))
        idx = None if image_idx is None else jnp.asarray(image_idx)
        return ms.render(self.scene, self.config.scene, camera, idx, rcfg,
                         specular_weight=options.get("specular_weight", 1.0))

    def _evaluate_view(self, view: ImageView, point_labels=None):
        """One view through the compiled eval program. Returns
        (Evaluation, cluster features (K,), visibility mask (C,))."""
        camera = self.camera_params(view.image_idx)
        if point_labels is None:
            point_labels = jnp.zeros((self.scene.capacity,), jnp.int32)
        rendering, metrics, feats, vis_mask = self._eval_render(
            self.scene, camera.T_camera_world, camera.projection,
            camera.near_plane, camera.far_plane,
            jnp.int32(view.image_idx), jnp.asarray(view.image), point_labels)
        source = jnp.asarray(view.image, jnp.float32) / 255.0
        ev = Evaluation(view.filename, rendering, source, precomputed=metrics)
        return ev, feats, vis_mask

    def evaluate_image(self, view: ImageView) -> Evaluation:
        ev, _feats, _vis = self._evaluate_view(view)
        return ev

    def evaluate_training(self, name: str, views: Sequence[ImageView]):
        """Eval + view-clustering rebuild (reference trainer.py:327-371)."""
        worst = Heap(self.config.log_worst_images)
        metrics = {}
        point_clusters = cluster.PointClusters.cluster(
            self.scene.points["position"], self._num_clusters,
            active=self.scene.active, key=self._next_key(),
            iters=self.config.vis_cluster_iters)

        features = []
        log_idx = set(self._rng.choice(
            len(views), min(self.config.num_logged_images, len(views)),
            replace=False))
        point_visible = np.zeros(self.scene.capacity, np.int32)

        for i, view in enumerate(views):
            ev, feats, vis_mask = self._evaluate_view(
                view, point_clusters.point_labels)
            metrics[view.filename] = ev.metrics
            worst.push(-ev.psnr, ev)
            features.append(feats)
            point_visible += np.asarray(vis_mask, np.int32)
            if i in log_idx:
                self.log_evaluation_images(f"{name}_images/{ev.image_id}", ev,
                                           log_source=self.step == 0)

        for j, (_v, ev) in enumerate(worst):
            self.log_evaluation_images(f"{name}_images/worst_{j}", ev,
                                       log_source=True)

        self.logger.log_histogram(f"eval_{name}/points_visible", point_visible)
        self.log_evaluation_table(name, metrics)
        self.view_clustering = cluster.ViewClustering(
            point_clusters, jnp.stack(features))

    def evaluate_dataset(self, name: str, views: Sequence[ImageView]):
        metrics, metrics_cc = {}, {}
        log_idx = set(self._rng.choice(
            len(views), min(self.config.num_logged_images, len(views)),
            replace=False)) if views else set()
        for i, view in enumerate(views):
            ev = self.evaluate_image(view)
            ev_cc = ev.color_corrected()
            metrics[view.filename] = ev.metrics
            metrics_cc[view.filename] = ev_cc.metrics
            if i in log_idx:
                self.log_evaluation_images(f"{name}_images/{ev.image_id}", ev_cc,
                                           log_source=self.step == 0)
        self.log_evaluation_table(name, metrics)
        self.log_evaluation_table(f"{name}_cc", metrics_cc)

    def log_evaluation_images(self, name: str, ev: Evaluation,
                              log_source: bool = True):
        if not self.config.log_images:
            return
        from splat_trainer_tpu.utils.colorize import colorize
        self.logger.log_image(
            f"{name}/render", np.asarray(ev.rendering.image),
            caption=f"{ev.filename} PSNR={ev.psnr:.3f} ssim={ev.ssim:.3f}")
        if ev.rendering.median_ndc_image is not None:
            self.logger.log_image(
                f"{name}/depth", colorize(np.asarray(ev.rendering.median_ndc_image)),
                caption=ev.filename)
        if log_source:
            self.logger.log_image(f"{name}/image", np.asarray(ev.source_image),
                                  caption=ev.filename)

    def log_evaluation_table(self, name: str, metrics: dict):
        self.logger.log_evaluations(f"eval_{name}/evals", metrics)
        if not metrics:
            return
        keys = next(iter(metrics.values())).keys()
        for k in keys:
            vals = [m[k] for m in metrics.values()]
            self.logger.log_value(f"eval_{name}/{k}", float(np.mean(vals)))
            self.logger.log_histogram(f"eval_{name}/{k}_hist", np.asarray(vals))

    def evaluate(self) -> dict:
        self.print(f"evaluating at step {self.step}")
        self.evaluate_training("train", self.dataset.train(shuffle=False))
        val = self.dataset.val()
        if len(val) > 0:
            self.evaluate_dataset("val", val)
        means = self.eval_metrics()
        n = int(self.scene.active.sum())
        self.print(f"step={self.step:<6d} n={n:<8d} {format_dict(means)}")
        return means

    def eval_metrics(self, names=("ssim", "psnr")) -> dict:
        result = {}
        for category in ("train", "val", "val_cc"):
            key = f"eval_{category}"
            if key in self.logger:
                vals = self.logger[key]
                result.update({f"{category}_{k}": v.value
                               for k, v in vals.items() if k in names})
        return result

    # -- training loop --------------------------------------------------------

    def _next_key(self):
        self._key, sub = jax.random.split(self._key)
        return sub

    # HBM budget for staging the whole dataset on device (one upload at
    # train start instead of ~5 MB host->device per step — through the
    # remote-TPU tunnel the per-step upload dominates the step itself)
    DEVICE_IMAGE_CACHE_BYTES = 4 << 30

    def _stage_images(self) -> bool:
        """One-time device staging of all dataset images (uint8).

        Returns False (and leaves the per-batch upload path in place) when
        the dataset exceeds the HBM budget or image sizes are mixed."""
        n = self.camera_table.num_images
        w, h = self.camera_table.image_size
        if n * w * h * 3 > self.DEVICE_IMAGE_CACHE_BYTES:
            return False
        try:
            views = self.dataset.loader(list(range(n)))
            imgs = np.zeros((n, h, w, 3), np.uint8)
            for v in views:
                imgs[v.image_idx] = v.image
        except (ValueError, KeyError, IndexError):
            return False   # mixed sizes / sparse indexing: keep host path
        self._device_images = jnp.asarray(imgs)
        self.print(f"staged {n} images ({n * w * h * 3 / 1e6:.0f} MB) on device")
        return True

    def make_batch(self, views: List[ImageView]) -> TrainBatch:
        idx = jnp.asarray([v.image_idx for v in views])
        t, proj, near, far = self.camera_table.gather_batch(idx)
        if getattr(self, "_device_images", None) is not None:
            images = self._device_images[idx]
        else:
            images = jnp.asarray(np.stack([v.image for v in views]))
        batch = TrainBatch(images=images, image_idx=idx, T_camera_world=t,
                           projection=proj, near=near, far=far)
        if self._batch_sharding is not None:
            batch = jax.device_put(batch, self._batch_sharding)
        return batch

    def iter_views(self):
        """Worker-side batch source: HOST work only (view selection + image
        IO). Device conversion (make_batch) must happen on the MAIN thread:
        the axon PJRT tunnel deadlocks under concurrent device access from
        a second thread — observed as training wedging at the loop entry
        with every thread parked in futex waits while the single-threaded
        bench ran fine on the same chip."""
        while True:
            batch_idx = self.view_selection.select_images(
                self.view_clustering, self.progress)
            yield self.dataset.loader(batch_idx)

    # -- instance-capacity bucketing ----------------------------------------
    # The binning/sort/reduction pipeline costs scale with the STATIC
    # instance capacities, not the live instance count, so the single-chip
    # path re-jits the step at the smallest ladder size that fits the
    # measured demand (with headroom). Buckets are revisited at logging
    # cadence (metrics are host-synced there anyway); growth applies
    # immediately, shrinking needs a persistent streak to avoid recompile
    # flip-flop. State shapes are identical across buckets, so donated
    # scene/pstate move between compiled variants freely.

    BUCKET_HEADROOM = 1.3
    SHRINK_STREAK = 3
    # Steps of growth-free quiet required before any shrink. Shrinking is
    # only worth a ~2-min remote re-jit when the smaller bucket will
    # persist for thousands of steps; during active densification demand
    # regrows past the fine rung within a few hundred steps, and the
    # grow/shrink pair at every eighth-step demand increment turns the run
    # into a recompile storm (observed live: a compile every 2-5 min, ~10x
    # wall-clock overhead). Growth stamps _last_grow_step; the shrink path
    # waits this many steps after it.
    SHRINK_QUIET_STEPS = 1500

    def _sat_enabled(self) -> bool:
        """Saturation compaction applies on the single-chip pallas path."""
        from splat_trainer_tpu.ops.renderer import resolve_backend
        return (self.config.saturation_cull
                and resolve_backend(self.config.raster_config()) == "pallas")

    def _initial_bucket(self):
        rc = self.config.raster_config()
        mr = rc.max_render_instances or rc.max_instances
        # the sat stream starts capacity-neutral (= Mr, lossless) and
        # shrinks once sat_demand is measured
        return (rc.max_instances, mr, mr if self._sat_enabled() else None)

    def _capacity_ladder(self):
        rc = self.config.raster_config()
        ceiling = rc.max_instances
        k = rc.chunk_size
        # eighth-step rungs between powers of two: the step's gather/sort/
        # scatter costs scale ~linearly with the static capacities, so a
        # coarse ladder wastes up to 33% capacity headroom as real
        # milliseconds. Fine rungs are used when SHRINKING to a stable
        # occupancy; growth uses the coarse rungs because each rung
        # crossed is a full re-jit (~2-3 min through the remote compile
        # helper) and densification crosses rungs monotonically.
        return capacity_ladder(ceiling, k, FINE_RUNGS)

    def _coarse_ladder(self):
        rc = self.config.raster_config()
        return capacity_ladder(rc.max_instances, rc.chunk_size, COARSE_RUNGS)

    def _ladder_fit(self, need: int, coarse: bool = False) -> int:
        ladder = self._coarse_ladder() if coarse else self._capacity_ladder()
        for v in ladder:
            if v >= need:
                return v
        return ladder[-1]

    def _get_step_fn(self, bucket):
        fn = self._step_cache.get(bucket)
        if fn is None:
            m, mr, msat = bucket
            import dataclasses
            rc = dataclasses.replace(
                self.config.raster_config(),
                max_instances=m, max_render_instances=mr,
                max_sat_instances=msat)
            fn = jax.jit(
                functools.partial(
                    train_step,
                    scene_config=self.config.scene,
                    raster_config=rc,
                    image_size=self.camera_table.image_size,
                    ssim_levels=self.config.ssim_levels,
                ),
                donate_argnums=(0, 1),
            )
            self._step_cache[bucket] = fn
        return fn

    def _update_bucket(self, metrics):
        """Called on logging steps (metrics already host-synced)."""
        if not self.config.instance_bucketing:
            return
        demand = int(metrics.instance_demand)
        # clipped survivors belong in the Mr sizing (num_instances counts
        # only the kept ones)
        instances = (int(metrics.num_instances)
                     + int(float(metrics.clipped_instances) + 0.999))
        sat = int(getattr(metrics, "sat_demand", 0) or 0)
        if demand == 0 and instances == 0:
            return   # dense backend / no signal
        cur = self._bucket
        has_sat = cur[2] is not None
        need = (int(demand * self.BUCKET_HEADROOM),
                int(instances * self.BUCKET_HEADROOM),
                int(sat * self.BUCKET_HEADROOM) if has_sat else 0)
        # shrink sizes to the running max since the last bucket change:
        # per-camera demand varies by about the fine-rung spacing, so
        # sizing a shrink to one camera's low would thrash against the
        # next high camera (each transition is a full re-jit)
        hi = getattr(self, "_need_hi", (0, 0, 0))
        self._need_hi = tuple(max(a, b) for a, b in zip(hi, need))

        def fit(needs, coarse=False):
            m = self._ladder_fit(needs[0], coarse=coarse)
            mr = min(self._ladder_fit(needs[1], coarse=coarse), m)
            # the sat stream never exceeds the render stream it compacts
            msat = (min(self._ladder_fit(needs[2], coarse=coarse), mr)
                    if has_sat else None)
            return (m, mr, msat)

        want = fit(need)
        cmp_cur = cur if has_sat else cur[:2] + (0,)
        cmp_want = want if has_sat else want[:2] + (0,)
        grow = (any(w > c for w, c in zip(cmp_want, cmp_cur)
                    if c is not None)
                or int(metrics.clipped_instances) > 0)
        if grow:
            # growth picks from the COARSE ladder: demand rises monotonically
            # through densification and every rung crossed is a ~2-3 min
            # remote re-jit; the fine rungs are reached later via shrink once
            # occupancy stabilizes
            g = fit(need, coarse=True)
            self._bucket = tuple(
                None if c is None else max(gv, c) for gv, c in zip(g, cur))
            self._shrink_streak = 0
            self._need_hi = need
            self._last_grow_step = self.step
        elif any(w < c for w, c in zip(cmp_want, cmp_cur) if c is not None):
            quiet = self.step - getattr(self, "_last_grow_step", 0)
            if quiet < self.SHRINK_QUIET_STEPS:
                return
            self._shrink_streak += 1
            if self._shrink_streak >= self.SHRINK_STREAK:
                shr = fit(self._need_hi)
                new = tuple(None if c is None else min(sv, c)
                            for sv, c in zip(shr, cur))
                if new != cur:
                    self._bucket = new
                self._shrink_streak = 0
                self._need_hi = need
        else:
            self._shrink_streak = 0

    def _bucketed_train_step(self, scene, pstate, batch, hyper, key):
        return self._get_step_fn(self._bucket)(scene, pstate, batch, hyper, key)

    def training_step(self, batch: TrainBatch):
        self.step += int(batch.images.shape[0])
        hyper = make_hyper(self.config.scene, self.config, self.progress.t)
        self.scene, self.pstate, metrics = self._train_step(
            self.scene, self.pstate, batch, hyper, self._next_key())
        # keep the device-side metrics of EVERY step (no host sync here):
        # the densify overflow guard reads clipped_instances from it lazily,
        # so the guard never sees a stale value when the log cadence and the
        # densify interval misalign
        self._last_metrics = metrics
        if self.is_logging_step:
            # ONE device->host transfer for the whole (scalar) metrics tree:
            # each individual float()/int() is a separate tunnel round trip
            # (~30 ms nominal, seconds when the link degrades) and a logging
            # step reads ~10 of them
            self._log_step_metrics(jax.device_get(metrics))
        self.logger.step(self.progress)

    def _log_step_metrics(self, m):
        num_visible = int(m.num_visible)
        if num_visible == 0:
            raise exception.TrainingException(
                "No visible points — check training parameters or camera poses")
        self.logger.log_values("train/loss", dict(
            total=float(m.total),
            **{k: float(v) for k, v in m.reg.items()}))
        psnr = float(m.psnr)
        self.logger.log_values("train/metrics", dict(
            l1=float(m.l1), mse=float(m.mse), ssim=float(m.ssim), psnr=psnr))
        clipped = int(m.clipped_instances)
        if clipped > 0:
            self.logger.log_value("train/clipped_instances", clipped)
        self.logger.log_values("train/occupancy", dict(
            instances=int(m.num_instances),
            demand=int(m.instance_demand),
            sat_demand=int(getattr(m, "sat_demand", 0) or 0)))
        if getattr(self, "_bucket", None) is not None:
            self._update_bucket(m)
            self.logger.log_values("train/bucket", dict(
                max_instances=self._bucket[0],
                max_render=self._bucket[1],
                max_sat=self._bucket[2] or 0))

    def _build_controller_fns(self) -> SimpleNamespace:
        """Jit the controller's device programs ONCE per Trainer.

        Re-jitting per call (a fresh functools.partial every invocation) would
        retrace + recompile each densify — and for MCMC, every non-densify
        step. Schedule-dependent quantities (t, target_points, noise_level)
        stay traced arguments so the compiled program is reused.
        """
        cfg = self.config.controller
        fns = SimpleNamespace(densify=None, noise=None, opacity_reset=None)
        if isinstance(cfg, TargetConfig):
            densify_local = functools.partial(
                densify_device,
                prune_rate=cfg.prune_rate, min_views=cfg.min_views,
                max_scale_px=cfg.max_scale_px, min_split_px=cfg.min_split_px)
            if self.config.pp:
                # per-shard densify: no full-capacity gather materializes
                # (SURVEY.md §2.4(d); VERDICT r1 item 5)
                from splat_trainer_tpu.parallel import points_parallel as ppar
                fns.densify = ppar.make_pp_densify(
                    self.mesh, self.scene, densify_local)
                fns.densify_pp = True
            else:
                fns.densify = jax.jit(densify_local, donate_argnums=(0, 1))
            if cfg.opacity_reset_interval:
                from splat_trainer_tpu.controller.target import (
                    opacity_reset_device,
                )
                fns.opacity_reset = jax.jit(functools.partial(
                    opacity_reset_device,
                    reset_alpha=cfg.opacity_reset_alpha), donate_argnums=(0,))
        elif isinstance(cfg, MCMCConfig):
            fns.densify = jax.jit(functools.partial(
                mcmc_prune_split,
                opacity_threshold=cfg.opacity_threshold,
                max_scale_px=cfg.max_scale_px,
                min_split_px=cfg.min_split_px), donate_argnums=(0, 1))
            fns.noise = jax.jit(functools.partial(
                mcmc_noise_step,
                opacity_threshold=cfg.opacity_threshold,
                min_views=cfg.min_views), donate_argnums=(0,))
        return fns

    def controller_step(self):
        cfg = self.config.controller
        ctl = self.controller
        if isinstance(cfg, TargetConfig):
            if (self._densify.opacity_reset is not None
                    and ctl.should_reset_opacity(self.progress)):
                self.scene, n_clamped = self._densify.opacity_reset(self.scene)
                self.logger.log_value("densify/opacity_reset",
                                      int(n_clamped))
            if ctl.should_densify(self.progress):
                # instance-overflow guard: cap/back off the count target when
                # the rasterizer reports dropped instances (static budget).
                # Read from the latest step's device metrics — synced here,
                # at densify cadence, not in the hot loop.
                last = getattr(self, "_last_metrics", None)
                clipped = int(last.clipped_instances) if last is not None else 0
                # bucket-lag clipping is transient (the bucketed step grows
                # at the next logging step) — only ceiling clipping may
                # freeze the point schedule
                bucket = getattr(self, "_bucket", None)
                rc_ceil = self.config.raster_config()
                mr_ceil = rc_ceil.max_render_instances or rc_ceil.max_instances
                can_grow = (bucket is not None
                            and (bucket[0] < rc_ceil.max_instances
                                 or bucket[1] < mr_ceil
                                 or (len(bucket) > 2 and bucket[2] is not None
                                     and bucket[2] < mr_ceil)))
                ctl.note_clipping(clipped, self.config.max_instances,
                                  self.progress, can_grow=can_grow)
                args = ctl.densify_args(self.progress)
                self.scene, self.pstate, metrics = self._densify.densify(
                    self.scene, self.pstate, self._next_key(),
                    t=jnp.float32(args["t"]),
                    target_points=jnp.int32(args["target_points"]))
                self.logger.log_values(
                    "densify", {k: int(v) for k, v in metrics.items()})
        elif isinstance(cfg, MCMCConfig):
            if ctl.should_densify(self.progress):
                self.scene, self.pstate, metrics = self._densify.densify(
                    self.scene, self.pstate, self._next_key())
                self.logger.log_values(
                    "densify", {k: int(v) for k, v in metrics.items()})
            else:
                self.scene = self._densify.noise(
                    self.scene, self.pstate, self._next_key(),
                    noise_level=jnp.float32(ctl.noise_level(self.progress)))
        if self.config.pp:
            # densify ran under plain jit (GSPMD); re-pin the state to the
            # point sharding so the next pp step takes it shard-resident
            self.scene = jax.device_put(self.scene, self._scene_sharding)
            self.pstate = jax.device_put(self.pstate, self._pstate_sharding)

    def checkpoint(self, save: bool = True):
        bad = check_finite_tree(
            {"points": self.scene.points, "color": self.scene.color_params,
             "glo": self.scene.glo_table}, "scene")
        if bad:
            raise exception.NaNParameterException(
                f"Non-finite entries detected: {bad}")

        from splat_trainer_tpu.debug.diagnostics import (
            log_checkpoint_diagnostics, log_gradient_histograms,
        )
        log_checkpoint_diagnostics(self.logger, self.scene, self.pstate)
        if self.config.log_details and self.step > 0:
            # one extra backward on a fresh batch to expose raw gradients
            # (reference log_gradients, mlp_scene.py:168-178)
            if self._grad_fn is None:
                from splat_trainer_tpu.trainer.train_step import batch_gradients
                self._grad_fn = jax.jit(functools.partial(
                    batch_gradients,
                    scene_config=self.config.scene,
                    raster_config=self.config.raster_config(),
                    image_size=self.camera_table.image_size,
                    ssim_levels=self.config.ssim_levels))
            batch = self.make_batch(next(self.iter_views()))
            hyper = make_hyper(self.config.scene, self.config, self.progress.t)
            bundle = self._grad_fn(self.scene, batch, hyper)
            log_gradient_histograms(
                self.logger, bundle.grads.points, bundle.vis_acc,
                vis_smooth=self.config.scene.vis_smooth)

        metrics = self.evaluate()

        if len(self.evaluation_log) > 0 and "train_ssim" in metrics:
            ssim = metrics["train_ssim"]
            initial = self.evaluation_log[0].get("train_ssim", -1)
            prev = self.evaluation_log[-1].get("train_ssim", -1)
            # tolerance-gated: a trainer can start from an already-trained
            # scene (staged pose-recovery, finetune), where the first eval
            # is HIGH and a transient dip below it is expected — only a
            # drop beyond the configured regression budget is a collapse
            if ssim < initial - self.config.max_ssim_regression:
                raise exception.NoProgressException(
                    "ssim fell below the initial value by more than "
                    f"max_ssim_regression ({self.config.max_ssim_regression})")
            if prev > ssim + self.config.max_ssim_regression:
                raise exception.NoProgressException(
                    f"ssim regression {prev:.4f} -> {ssim:.4f} exceeds "
                    f"{self.config.max_ssim_regression}")

        self.evaluation_log.append(dict(step=self.step, **metrics))
        if save and self.config.save_output:
            self.write_checkpoint()
        self.last_checkpoint = self.step
        return metrics

    def update_progress(self):
        now = time.time()
        if self.pbar is not None:
            self.pbar.update(self.step - self.pbar.n)
            self.pbar.set_postfix_str(" ".join(self.pbar_metrics()))
        if self.last_time is not None:
            self.running_time.append(now - self.last_time)
            step_rate = self.config.log_interval / np.mean(self.running_time)
            self.logger.log_value("train/step_rate", step_rate)
            if (self.config.min_step_rate is not None
                    and len(self.running_time) == self.running_time.maxlen
                    and step_rate < self.config.min_step_rate):
                raise exception.TrainingTimeoutException(
                    f"step rate {step_rate:.3f} < {self.config.min_step_rate}")
        self.last_time = now

    def pbar_metrics(self) -> list:
        desc = []
        if "densify" in self.logger:
            d = self.logger["densify"]
            desc.append(f"points(+{d['split'].value} -{d['prune'].value} "
                        f"= {d['n'].value})")
        if "train/metrics" in self.logger:
            m = self.logger["train/metrics"]
            desc.append(f"ssim:{m['ssim'].value:.3f} psnr:{m['psnr'].value:.3f}")
        return desc

    def print(self, s: str):
        if self.pbar is not None:
            self.pbar.write(s)
        else:
            print(s)

    def set_paused(self, paused: bool):
        self.state = TrainerState.Paused if paused else TrainerState.Training

    def is_training(self):
        return self.state in (TrainerState.Training, TrainerState.Paused)

    def emit_update(self):
        for hook in self.on_update:
            hook()

    def train(self, state=TrainerState.Training) -> dict:
        from tqdm import tqdm
        self.state = state
        self.dataset.load_images()
        self.checkpoint(self.config.save_checkpoints)

        self.print(f"training for {self.config.total_steps - self.step} steps, "
                   f"eval every {self.config.eval_steps}")
        self._stage_images()
        self.loader = ThreadedLoader(self.iter_views())
        self.pbar = tqdm(initial=self.step, total=self.config.total_steps,
                         desc=self.state,
                         disable=bool(os.environ.get("TQDM_DISABLE")))

        while self.step < self.config.total_steps:
            batch = self.make_batch(self.loader.next())
            self.training_step(batch)

            if self.last_checkpoint + self.config.eval_steps <= self.step:
                self.checkpoint(self.config.save_checkpoints
                                or self.step == self.config.total_steps)
                self.last_time = None

            self.controller_step()

            if self.is_logging_step:
                self.emit_update()
                while self.state == TrainerState.Paused:
                    time.sleep(0.1)
                self.update_progress()

        self.state = TrainerState.Stopped
        self.pbar.close()
        return self.eval_metrics()

    def close(self):
        self.logger.close()
        if self.loader is not None:
            self.loader.stop()
