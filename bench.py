"""Benchmark: full training-step throughput at garden-recipe scale.

Prints the headline JSON line {"metric", "value", "unit", "vs_baseline"}
FIRST (as soon as the incumbent config is measured), then spends any
remaining budget on per-phase profiling (PROFILE.md) and a pruned
auto-tune stage, re-printing an updated headline if a knob wins. The
LAST stdout line is always the current headline, and a SIGTERM (driver
timeout) makes the process print it and exit 0 — a finite window can no
longer end the run without a recorded number (VERDICT r4 weak #1:
BENCH_r04.json rc=124, parsed=null).

Honesty rules (round-2 rework after the round-1 number was challenged):
- The scene comes from a TRAINED checkpoint under runs/ when one exists
  (the milestone runs leave one), falling back to a surface-sampled
  procedural cloud — NOT an i.i.d. random ball whose early-exit occupancy
  flatters the kernel.
- The step cycles through different cameras (no single-view cache effects).
- instances/tile statistics and the clipped-instance count are reported, so
  silent truncation or degenerate occupancy is visible.
- Per-phase timings (project+bin / forward / forward+backward / ssim /
  full step) are measured with blocking, and written to PROFILE.md.
- The auto-tune stage only switches between LOSSLESS kernel-variant knobs.
  Quality-gated knobs (grad_bf16_pack, batch_size>1) are never
  auto-enabled without a recorded garden-scale quality A/B pass.
- Tune candidates that lost in three consecutive rounds are retired from
  the default probe set (VERDICT r4 #7): kernel_basis and cumprod_scan
  (lost r2/r3/r4), exit_bands (295/363 ms vs 242 base, r4), chunk256
  (157.5 r3, 261.9 r4), tpb16 (243.7 r4), bwd_moments toggle (251.7 r4).

Baseline: taichi-splatting on A100 runs the Mip-NeRF-360 garden recipe
(1536x1024, ~1M gaussians mid-training) at roughly 12 images/sec
(BASELINE.md: the reference publishes no numbers; this is the A100 figure
the driver's north-star ratio is taken against).

Env knobs (all optional):
  BENCH_BUDGET_S=2700     global wall-clock budget; tuning stops early so
                          the headline always lands inside the window
  BENCH_TUNE=0            disable the auto-tune A/B stage
  BENCH_ITERS=30          final chained-loop iterations
  BENCH_AB_ITERS=10       per-candidate chained-loop iterations
  BENCH_TUNNEL_WAIT=120   seconds to wait for the axon relay before failing
  BENCH_FORCE_FALLBACK=1  skip checkpoints (synthetic scene; CPU smoke)
  BENCH_POINTS / BENCH_IMAGE_SIZE=WxH   fallback-scene scale overrides
"""

import functools
import json
import os
import signal
import sys
import time
from pathlib import Path

import numpy as np

BASELINE_IMAGES_PER_SEC = 12.0
IMAGE_SIZE = tuple(
    int(v) for v in os.environ.get("BENCH_IMAGE_SIZE", "1536x1024").split("x"))
TARGET_POINTS = int(os.environ.get("BENCH_POINTS", 1_000_000))

_T0 = time.perf_counter()
_BUDGET_S = float(os.environ.get("BENCH_BUDGET_S", 2700))


def budget_left() -> float:
    return _BUDGET_S - (time.perf_counter() - _T0)


# Local ports of the axon PJRT relay (/root/.tpu_init.py). When the relay
# process dies, ANY device contact (even jax.devices()) blocks forever —
# probe /proc/net/tcp for a listener instead of hanging the driver.
_RELAY_PORTS = (8082, 8083, 8087, 8092, 8093, 8097,
                8102, 8103, 8107, 8112, 8113, 8117)


def _relay_listening():
    want = {f"{p:04X}" for p in _RELAY_PORTS}
    try:
        lines = Path("/proc/net/tcp").read_text().splitlines()[1:]
    except OSError:
        return True  # can't tell; don't block a working setup
    for ln in lines:
        parts = ln.split()
        local, state = parts[1], parts[3]
        if state == "0A" and local.split(":")[1] in want:
            return True
    return False


def ensure_device_reachable():
    """Fail fast when the axon relay is down, instead of hanging forever.

    If a previous REAL on-chip measurement is persisted
    (BENCH_LAST_ONCHIP.json, written by a completed chip run of this
    script), print it as the result line with an explicit stale marker —
    an honestly-labeled measured number beats a hang or an empty record."""
    if os.environ.get("JAX_PLATFORMS", "") == "cpu":
        return
    deadline = time.time() + float(os.environ.get("BENCH_TUNNEL_WAIT", 120))
    while time.time() < deadline:
        if _relay_listening():
            return
        time.sleep(5)
    print("# FATAL: axon TPU relay is not listening (ports 8082-8117); "
          "device contact would hang forever.", file=sys.stderr)
    last = Path(__file__).parent / "BENCH_LAST_ONCHIP.json"
    if last.exists():
        rec = json.loads(last.read_text())
        rec["note"] = ("STALE: TPU tunnel down at bench time; this is the "
                       "last completed on-chip measurement "
                       f"({rec.get('measured_at')}, commit "
                       f"{rec.get('commit')}). " + rec.get("note", ""))
        print(json.dumps(rec))
        sys.exit(0)
    sys.exit(2)


def load_checkpoint_scene():
    """LARGEST-WORKLOAD trained checkpoint under runs/ -> (scene, config,
    camera table).

    Selection is by training-image pixel count first (from the run's saved
    dataset config), then by step — NOT newest-step: the baseline ratio is
    defined against the garden recipe (1536-longest, ~1M points), and round
    2's newest-step selection silently benched a 7x lighter scene against
    the garden baseline (VERDICT r2 weak #1). Every candidate found is
    printed with its workload so the choice is auditable.

    Returns None when no checkpoint is available (fresh clone)."""
    import jax

    from splat_trainer_tpu.config.loader import instantiate, load_config
    from splat_trainer_tpu.scripts.train import build_dataset
    from splat_trainer_tpu.trainer import checkpoint as ckpt

    best = None
    for cfg_path in sorted(Path("runs").glob("*/config.yaml")):
        ws = cfg_path.parent
        try:
            path = ckpt.find_latest_checkpoint(ws)
        except FileNotFoundError:
            continue  # run dir without checkpoints (intermediates untracked)
        if path is None:
            continue
        step = int(str(path).rsplit("_", 1)[-1])
        try:
            size = load_config(ws / "config.yaml")["dataset"].get(
                "image_size") or (0, 0)
        except Exception:
            size = (0, 0)
        pixels = int(size[0]) * int(size[1])
        print(f"# candidate: {path} ({size[0]}x{size[1]}, step {step})")
        if best is None or (pixels, step) > (best[0], best[1]):
            best = (pixels, step, ws, path)
    if best is None:
        return None
    _pixels, step, ws, path = best
    tree = load_config(ws / "config.yaml")
    config = instantiate(tree["trainer"])
    dataset = build_dataset(tree["dataset"])

    scene_t = config.scene.init_scene(
        jax.random.PRNGKey(0),
        _surface_cloud(10_000, config.scene), dataset.camera_table.num_images,
        capacity=config.capacity)
    from splat_trainer_tpu.controller.point_state import PointState
    state = ckpt.load_checkpoint(path, scene_t,
                                 PointState.new_zeros(scene_t.capacity))
    import jax.numpy as jnp
    scene = jax.tree_util.tree_map(jnp.asarray, state["scene"])
    print(f"# scene: checkpoint {path} (step {step}, "
          f"{int(np.asarray(scene.active).sum())} active points)")
    return scene, config, dataset.camera_table


def _surface_cloud(n_points, scene_config):
    """Surface-sampled procedural cloud (fallback scene source): points ON
    the courtyard surfaces with kNN-derived scales — trained-like occupancy,
    unlike an i.i.d. ball."""
    import jax

    from splat_trainer_tpu.data import procedural as P
    from splat_trainer_tpu.trainer.init import estimate_scale, from_scaled_pointcloud

    ds = P.ProceduralDataset(num_images=8, image_size=(64, 64),
                             cloud_points=n_points)
    pc = ds.pointcloud()
    import jax.numpy as jnp
    pts = jnp.asarray(pc.points)
    scales = estimate_scale(pts, 5) * 0.5
    g = from_scaled_pointcloud(pts, jnp.asarray(pc.colors), scales, 0.7,
                               feature_dim=3)
    return g


def fallback_scene():
    import jax

    from splat_trainer_tpu.data import procedural as P
    from splat_trainer_tpu.models.mlp_scene import MLPSceneConfig

    config_s = MLPSceneConfig()
    g = _surface_cloud(TARGET_POINTS, config_s)
    scene = config_s.init_scene(jax.random.PRNGKey(1), g, num_images=64,
                                capacity=TARGET_POINTS)
    ds = P.ProceduralDataset(num_images=64, image_size=(64, 64))
    print(f"# scene: fallback surface-sampled cloud ({TARGET_POINTS} points)")

    class _Cfg:
        scene = config_s
        l1_weight, mse_weight, ssim_weight = 0.0, 10.0, 1.0
        ssim_levels = 3
        color_corrector = None

        @staticmethod
        def raster_config(**kw):
            from splat_trainer_tpu.core.types import RasterConfig
            cap = max(1 << 18, min(1 << 22, TARGET_POINTS * 4))
            kw.setdefault("tile_size",
                          int(os.environ.get("BENCH_TILE_SIZE", 16)))
            return RasterConfig(max_instances=cap, chunk_size=128, **kw)

    return scene, _Cfg, ds.camera_table


def main():
    ensure_device_reachable()

    import dataclasses

    import jax

    if os.environ.get("JAX_PLATFORMS", "") == "cpu":
        # the environment's sitecustomize registers the axon TPU plugin and
        # overrides the env var — the config update is the reliable override
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from splat_trainer_tpu.controller.point_state import PointState
    from splat_trainer_tpu.core.types import CameraParams
    from splat_trainer_tpu.ops import tiling
    from splat_trainer_tpu.ops.projection import ndc_depth, project_to_image
    from splat_trainer_tpu.ops.ssim import multiscale_ssim_loss
    from splat_trainer_tpu.trainer.train_step import (
        TrainBatch, batch_gradients, make_hyper, train_step,
    )
    from splat_trainer_tpu.trainer.trainer import capacity_ladder

    loaded = None
    if not os.environ.get("BENCH_FORCE_FALLBACK"):
        try:
            loaded = load_checkpoint_scene()
        except Exception as e:
            print(f"# checkpoint load failed ({e}); using fallback scene")
    scene, cfg, camera_table = loaded if loaded else fallback_scene()
    scene_config = cfg.scene
    rcfg_base = cfg.raster_config()
    # a loaded checkpoint is benched at ITS OWN training resolution — scaling
    # a low-res-trained scene up blows splat footprints into meaningless
    # instance demand (observed: 45M clipped at 2x). The fallback synthetic
    # scene is built for the garden-recipe IMAGE_SIZE.
    w, h = camera_table.image_size if loaded else IMAGE_SIZE
    image_size = (w, h)

    # bench cameras: the dataset's own poses, intrinsics scaled to the
    # bench resolution
    cams = camera_table.cameras
    n_cams = min(8, camera_table.num_images)
    w0, h0 = camera_table.image_size
    sx, sy = w / w0, h / h0
    key = jax.random.PRNGKey(0)
    batches = []
    for i in range(n_cams):
        T = cams.camera_t_world[i][None]
        proj = (cams.intrinsics[i] * jnp.asarray([sx, sy, sx, sy]))[None]
        batches.append(TrainBatch(
            images=(jax.random.uniform(jax.random.fold_in(key, i),
                                       (1, h, w, 3)) * 255).astype(jnp.uint8),
            image_idx=jnp.array([i]),
            T_camera_world=T, projection=proj,
            near=cams.depth_range[i, 0][None], far=cams.depth_range[i, 1][None]))

    def stacked_batches(bs):
        """Group the per-camera batches into B-image TrainBatches."""
        groups = []
        for g0 in range(0, n_cams - bs + 1, bs):
            groups.append(jax.tree_util.tree_map(
                lambda *xs: jnp.concatenate(xs, axis=0),
                *batches[g0:g0 + bs]))
        return groups or [jax.tree_util.tree_map(
            lambda *xs: jnp.concatenate(xs, axis=0), *([batches[0]] * bs))]

    n_active = int(np.asarray(scene.active).sum())
    hyper = make_hyper(scene_config, cfg, 0.5)

    def _to_host(out):
        # force a device->host copy of a SCALAR that data-depends on the
        # output: unlike block_until_ready (observed unreliable through the
        # axon relay), a host transfer cannot complete before the
        # computation does — and reducing on-device first keeps the copy
        # off the timing (a full 1536x1024x3 image costs ~0.5 s through
        # the relay; a scalar ~30 ms RTT)
        leaf = jax.tree_util.tree_leaves(out)[0]
        np.asarray(jnp.sum(leaf))

    def timeit(fn, iters=10, warmup=2):
        out = None
        for _ in range(warmup):
            out = fn()
        _to_host(out)
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn()
        _to_host(out)
        return (time.perf_counter() - t0) / iters

    # ---- occupancy statistics (instances per tile, clipping) -------------
    def binning_stats_with(cfg_r):
        def binning_stats(batch):
            cam = CameraParams(
                T_camera_world=batch.T_camera_world[0],
                projection=batch.projection[0], near_plane=batch.near[0],
                far_plane=batch.far[0], image_size=image_size)
            g2d = project_to_image(scene.gaussians(), cam, cfg_r,
                                   active=scene.active)
            grid = tiling.make_tile_grid(image_size, cfg_r.tile_size)
            inst = tiling.expand_and_sort(
                g2d.mean, jnp.where(g2d.visible, g2d.radius, 0.0),
                g2d.visible,
                ndc_depth(g2d.depth, cam.near_plane, cam.far_plane),
                cfg_r, grid, conic=g2d.conic, opacity=g2d.opacity)
            return g2d, grid, inst
        return binning_stats

    def ladder_fit(need, ceiling, k=rcfg_base.chunk_size):
        # the trainer's fine (steady-state) rungs — one source of truth
        for c in capacity_ladder(ceiling, k):
            if c >= need:
                return c
        return ceiling

    # demand-bucketed capacities (the trainer's steady-state behavior:
    # Trainer._update_bucket resizes the jitted step the same way). One
    # binning program per tile_size — cache them, the auto-tune stage
    # revisits tile sizes.
    _bin_cache = {}

    def bucketed(rcfg_v):
        key_b = (rcfg_v.tile_size, rcfg_v.alpha_threshold)
        if key_b not in _bin_cache:
            bj = jax.jit(binning_stats_with(rcfg_v))  # ONE wrapper per
            # config: re-wrapping per call would re-trace each invocation
            out = [bj(b) for b in batches]
            _bin_cache[key_b] = (bj, out)
        bj, out = _bin_cache[key_b]
        demand = max(int(np.asarray(o[2].demand)) for o in out)
        instances = max(int(np.asarray(o[2].total)) for o in out)
        m_b = ladder_fit(int(demand * 1.3), rcfg_v.max_instances)
        mr_b = min(ladder_fit(int(instances * 1.3), rcfg_v.max_instances),
                   m_b)
        return dataclasses.replace(rcfg_v, max_instances=m_b,
                                   max_render_instances=mr_b), demand, instances

    rcfg, demand, instances = bucketed(rcfg_base)
    print(f"# bucketed capacities: max_instances={rcfg.max_instances} "
          f"max_render_instances={rcfg.max_render_instances} "
          f"(demand {demand}, post-cull {instances})")

    # ---- headline plumbing: emit early, re-emit on improvement, always
    # leave a JSON line as the LAST stdout line (VERDICT r4 #2) -------------
    iters = int(os.environ.get("BENCH_ITERS", 30))
    garden_class = (w * h >= int(1536 * 1024 * 0.85)
                    and n_active >= 500_000)
    _last_result = {}

    def _persist_onchip(result):
        if jax.default_backend() in ("cpu",):
            return
        import datetime
        import subprocess
        try:
            commit = subprocess.run(
                ["git", "rev-parse", "--short", "HEAD"],
                cwd=Path(__file__).parent, capture_output=True,
                text=True).stdout.strip()
        except Exception:
            commit = "unknown"
        (Path(__file__).parent / "BENCH_LAST_ONCHIP.json").write_text(
            json.dumps({**result,
                        "measured_at": datetime.date.today().isoformat(),
                        "commit": commit,
                        "note": "see PROFILE.md for the per-phase profile"})
            + "\n")

    def make_result(dt_per_image, label, bs=1):
        images_per_sec = 1.0 / dt_per_image
        result = {
            "metric": "train_images_per_sec_per_chip",
            "value": round(images_per_sec, 3),
            "unit": "images/sec/chip",
            # workload label: a ratio against the garden-recipe A100
            # baseline is only honest at garden scale (VERDICT r2 weak #1).
            "workload": {
                "image_size": f"{w}x{h}",
                "active_points": n_active,
                "batch_size": bs,
                "scene": ("trained checkpoint" if loaded
                          else "synthetic fallback"),
                "garden_class": garden_class,
            },
            "config": label,
            "protocol": f"bench.py chained {iters}-step loop, "
                        f"{'checkpoint' if loaded else 'fallback'} scene "
                        f"{w}x{h}, {n_active} active points",
            "vs_baseline": (round(images_per_sec / BASELINE_IMAGES_PER_SEC, 3)
                            if garden_class else None),
        }
        if not garden_class:
            result["vs_baseline_note"] = (
                "workload below garden scale (1536x1024, >=500k points); "
                "ratio vs the garden-recipe A100 baseline withheld")
        return result

    def emit(result):
        _last_result.clear()
        _last_result.update(result)
        print(json.dumps(result), flush=True)
        _persist_onchip(result)

    def _on_term(signum, frame):
        # driver timeout: leave the current headline as the last line
        if _last_result:
            print(json.dumps(_last_result), flush=True)
            sys.stdout.flush()
        os._exit(0)

    signal.signal(signal.SIGTERM, _on_term)

    scene0 = scene

    def make_step(rcfg_v):
        return jax.jit(functools.partial(
            train_step, scene_config=scene_config, raster_config=rcfg_v,
            ssim_levels=3), donate_argnums=(0, 1))

    def measure_full(rcfg_v, n_iters, bs=1):
        """Chained-step wall-clock at a config: (seconds per IMAGE, metrics)."""
        step_v = make_step(rcfg_v)
        bb = batches if bs == 1 else stacked_batches(bs)
        sc = jax.tree_util.tree_map(jnp.copy, scene0)
        ps = PointState.new_zeros(scene0.capacity)
        sc, ps, m = step_v(sc, ps, bb[0], hyper, key)   # compile
        float(np.asarray(m.mse))
        t0 = time.perf_counter()
        for i in range(n_iters):
            sc, ps, m = step_v(sc, ps, bb[i % len(bb)], hyper, key)
        # sync on a forced host transfer, not block_until_ready: the axon
        # relay has been observed returning from block_until_ready before
        # the chained steps complete (sub-ms "measurements" of a 250 ms
        # step); a host copy of an output cannot complete early.
        mse = float(np.asarray(m.mse))
        if not np.isfinite(mse):
            raise RuntimeError(f"non-finite mse {mse} in measured loop")
        dt = (time.perf_counter() - t0) / n_iters
        clipped = int(m.clipped_instances)
        del sc, ps
        return dt / bs, clipped

    # ---- HEADLINE FIRST: the incumbent (committed-default) config ---------
    dt_img, clipped_step = measure_full(rcfg, iters)
    base_label = (f"ts{rcfg.tile_size} tpb{rcfg.tiles_per_block} "
                  f"k{rcfg.chunk_size} (committed defaults, bucketed)")
    print(f"# headline: {dt_img*1e3:.2f} ms/image at {base_label} "
          f"({budget_left():.0f}s budget left)")
    emit(make_result(dt_img, base_label))
    best_dt, best_rcfg, best_label, best_bs = dt_img, rcfg, base_label, 1

    # ---- occupancy at the incumbent config --------------------------------
    binning_bucketed = jax.jit(binning_stats_with(rcfg))
    g2d, grid, inst = binning_bucketed(batches[0])
    counts = np.asarray(inst.tile_counts)
    occ = {
        "visible_points": int(np.asarray(g2d.visible).sum()),
        "instances": int(np.asarray(inst.total)),
        "aabb_demand": int(np.asarray(inst.demand)),
        "clipped_instances": int(np.asarray(inst.clipped)),
        "tiles": int(counts.size),
        "inst_per_tile_p50": float(np.percentile(counts, 50)),
        "inst_per_tile_p90": float(np.percentile(counts, 90)),
        "inst_per_tile_max": int(counts.max()),
    }
    print("# occupancy:", json.dumps(occ))

    # ---- per-phase timings + PROFILE.md (budget-gated) --------------------
    phases = {"full_step": dt_img * 1}
    rows = []
    if budget_left() > 420:
        grad_fn = jax.jit(functools.partial(
            batch_gradients, scene_config=scene_config, raster_config=rcfg,
            ssim_levels=3))

        def render_only(batch):
            cam = CameraParams(
                T_camera_world=batch.T_camera_world[0],
                projection=batch.projection[0], near_plane=batch.near[0],
                far_plane=batch.far[0], image_size=image_size)
            from splat_trainer_tpu.models import mlp_scene as ms
            return ms.render(scene, scene_config, cam, batch.image_idx[0],
                             rcfg).image

        render_jit = jax.jit(render_only)
        img_a = render_jit(batches[0])
        img_b = (batches[0].images[0].astype(jnp.float32) / 255.0)
        ssim_grad = jax.jit(jax.grad(
            lambda x: multiscale_ssim_loss(x, img_b, 3)[0]))

        phases["project_bin"] = timeit(
            lambda: binning_bucketed(batches[0])[2].tile_starts)
        phases["render_fwd"] = timeit(lambda: render_jit(batches[0]))
        phases["ssim_fwd_bwd"] = timeit(lambda: ssim_grad(img_a))
        phases["grads_fwd_bwd"] = timeit(
            lambda: grad_fn(scene, batches[0], hyper).heur)
        print("# phases (ms):", json.dumps(
            {k: round(v * 1e3, 3) for k, v in phases.items()}))

        # roofline accounting (VERDICT r1 weak #2): per-phase FLOP/byte
        # models from measured occupancy, against v5e peaks (public spec:
        # ~197 bf16 TFLOPS; f32 through the MXU ~1/4; HBM ~819 GB/s).
        # MODELS, not counters — good enough to attribute compute- vs
        # bandwidth- vs latency-bound phases.
        PEAK_F32 = 49e12
        PEAK_HBM = 819e9
        n_inst = occ["instances"]
        dem = occ["aabb_demand"]
        M = rcfg.max_instances
        Mr = rcfg.max_render_instances or M
        K, Pp = rcfg.chunk_size, rcfg.tile_size ** 2
        npix = w * h

        def row(name, t, flops, bytes_):
            return {
                "phase": name, "ms": t * 1e3,
                "gflops": flops / 1e9, "gb": bytes_ / 1e9,
                "pct_flops": 100.0 * flops / t / PEAK_F32,
                "pct_hbm": 100.0 * bytes_ / t / PEAK_HBM,
            }

        bin_bytes = M * (20 * 8 + 12 * 4 + 8 * 4) + dem * 4
        fwd_flops = n_inst * (2 * Pp * K / K + 30 * Pp + 2 * Pp * K)
        fwd_bytes = n_inst / K * (16 * K * 4) + Mr * 16 * 4 + npix * 8 * 4
        bwd_flops = 2.5 * fwd_flops
        bwd_bytes = 2.0 * fwd_bytes + Mr * 16 * 4 * 3
        ssim_flops = 3 * npix * 3 * (2 * 11 * 11 * 4)
        render_t = max(phases["render_fwd"] - phases["project_bin"], 1e-4)
        bwd_t = max(phases["grads_fwd_bwd"] - phases["render_fwd"]
                    - phases["ssim_fwd_bwd"], 1e-4)
        rows = [
            row("project+bin+sort", phases["project_bin"],
                n_active * 150 + dem * 10, bin_bytes),
            row("composite fwd (+color)", render_t, fwd_flops, fwd_bytes),
            row("backward (kernel+reduce)", bwd_t, bwd_flops, bwd_bytes),
            row("ssim fwd+bwd", phases["ssim_fwd_bwd"], 3 * ssim_flops,
                npix * 3 * 4 * 12),
        ]
    else:
        print(f"# phases: SKIPPED (budget {budget_left():.0f}s)")

    # ---- auto-tune: pruned probe set, budget-gated per candidate ----------
    # Probes that lost in >=3 rounds (or decisively at this workload) are
    # retired — see module docstring. What remains: knobs that were
    # borderline (pallas_scans: -1% r4, below the noise margin), scene-
    # dependent (saturation compaction), or NEW at this workload (tile_size
    # 64, batch>1 amortization).
    scene0_iters_ab = int(os.environ.get("BENCH_AB_ITERS", 10))
    iters_ab = scene0_iters_ab

    def measure(rcfg_v, bs=1):
        step_v = make_step(rcfg_v)
        bb = batches if bs == 1 else stacked_batches(bs)
        sc = jax.tree_util.tree_map(jnp.copy, scene0)
        ps = PointState.new_zeros(scene0.capacity)
        sc, ps, m = step_v(sc, ps, bb[0], hyper, key)
        float(np.asarray(m.mse))
        sc, ps, m = step_v(sc, ps, bb[1 % len(bb)], hyper, key)
        float(np.asarray(m.mse))
        # TWO chained loops per candidate, best-of-2: single-sample A/Bs
        # through the relay flip 5-10% calls on noise (VERDICT r2 weak #7)
        reps = []
        n_it = max(2, iters_ab // bs)
        for _rep in range(2):
            t0 = time.perf_counter()
            for i in range(n_it):
                sc, ps, m = step_v(sc, ps, bb[i % len(bb)], hyper, key)
            mse = float(np.asarray(m.mse))
            if not np.isfinite(mse):
                raise RuntimeError(f"non-finite mse {mse} in A/B candidate")
            reps.append((time.perf_counter() - t0) / n_it / bs)
        del sc, ps
        return min(reps)

    ab_table = []

    def candidate_cost_s():
        # compile (~40-90 s through the relay at garden scale) + 2 timed reps
        return 100 + 2 * iters_ab * best_dt

    def try_measure(name, rcfg_v, bs=1):
        if budget_left() < candidate_cost_s() + 60:
            print(f"# tune {name}: SKIPPED (budget {budget_left():.0f}s)")
            return None
        try:
            t = measure(rcfg_v, bs=bs)
            ab_table.append((name, rcfg_v, t, bs))
            print(f"# tune {name}: {t*1e3:.2f} ms/image")
            return t
        except Exception as e:  # Mosaic compile/shape failures -> skip
            ab_table.append((name, rcfg_v, None, bs))
            print(f"# tune {name}: FAILED ({type(e).__name__}: {e})"[:300])
            return None

    # adoption margin (VERDICT r3 weak #7): a candidate only displaces the
    # incumbent best when it wins by >=3% — best-of-2 chained loops through
    # the relay still flip 1-3% calls on noise, and a noise-level greedy
    # pick must not change a committed default.
    TUNE_MARGIN = 0.97
    # Repeat-winner margin: knobs that have now won (by <3%) in two
    # consecutive rounds at this workload — pallas_scans (r4: 239.5 vs
    # 241.9; r5: see PROFILE.md) and batch4 (r5: 218.9 vs 222.6) — may be
    # adopted on ANY probe win: the final full re-measure
    # (`measure_full` + the `dt2 < dt_img` emit gate below) is the noise
    # arbiter, so a probe-stage noise flip cannot move the headline.
    REPEAT_MARGIN = 1.0
    margin_notes = []

    def _quality_ab_pass(arm, tol_db=0.15):
        """Quality-gated knobs only become adoptable after the committed
        garden-scale quality A/B (runs/ab_<arm> vs runs/ab_control, the
        resume-2k-steps protocol in scripts_dev/quality_ab.py)."""
        base = Path(__file__).parent / "runs"
        try:
            ctrl = json.loads(
                (base / "ab_control" / "result.json").read_text())
            res = json.loads(
                (base / f"ab_{arm}" / "result.json").read_text())
            d = res["val_psnr"] - ctrl["val_psnr"]
            print(f"# quality A/B {arm}: val_psnr {res['val_psnr']:.2f}"
                  f" vs control {ctrl['val_psnr']:.2f} ({d:+.2f} dB)")
            return d >= -tol_db
        except Exception:
            return False

    def _scans_qualified():
        try:
            rec = json.loads(
                (Path(__file__).parent / "runs" /
                 "scan_qualification.json").read_text())
            return bool(rec.get("qualified"))
        except Exception:
            return False

    _remeasured = [None]

    def _remeasure_emit():
        """Full re-measure of the current tuned best; emits an updated
        headline only if it beats the incumbent's full measure. Runs
        BEFORE the info-only probes: in the first r5 chip run the adopted
        scans+sat config (216.8 ms probe vs 222.6 incumbent) never got its
        re-measure because the alpha info probes drained the budget first
        — adoption-capable work must not be starved by probes that cannot
        change the headline. Idempotent per (config, batch)."""
        nonlocal clipped_step
        if best_rcfg is rcfg and best_bs == 1:
            return
        if _remeasured[0] == (id(best_rcfg), best_bs):
            return
        if budget_left() <= 120:
            print(f"# re-measure of adopted config SKIPPED "
                  f"(budget {budget_left():.0f}s)")
            return
        dt2, clipped2 = measure_full(best_rcfg, max(iters // best_bs, 4),
                                     bs=best_bs)
        print(f"# adopted {best_label}: {dt2*1e3:.2f} ms/image")
        _remeasured[0] = (id(best_rcfg), best_bs)
        if dt2 < dt_img:
            clipped_step = clipped2
            emit(make_result(dt2, best_label, bs=best_bs))

    if os.environ.get("BENCH_TUNE", "1") != "0" and budget_left() > 300:
        import dataclasses as _dc
        print("# tune: retired probes (3-round losers, VERDICT r4 #7): "
              "kernel_basis, cumprod_scan, exit_bands, chunk256, tpb16, "
              "bwd_moments, grad_pack_in_kernel")
        # (1) pallas_scans: won by 1% in r4 (239.49 vs 241.94) — below the
        # adoption margin but the only sub-noise winner; keep probing.
        if not rcfg.pallas_scans and _scans_qualified():
            t = try_measure("pallas_scans=True",
                            _dc.replace(rcfg, pallas_scans=True))
            if t is not None and t <= best_dt * REPEAT_MARGIN and t < best_dt:
                best_dt, best_rcfg = t, _dc.replace(rcfg, pallas_scans=True)
                best_label = "pallas_scans=True"
        # (2) saturation compaction at a demand-bucketed capacity: scene-
        # dependent (pays on deep-occupancy trained scenes).
        try:
            from splat_trainer_tpu.models import mlp_scene as _ms
            mr_b = best_rcfg.max_render_instances or best_rcfg.max_instances
            probe_cfg = _dc.replace(best_rcfg, max_sat_instances=mr_b)

            def _sat_probe(batch):
                cam = CameraParams(
                    T_camera_world=batch.T_camera_world[0],
                    projection=batch.projection[0],
                    near_plane=batch.near[0], far_plane=batch.far[0],
                    image_size=image_size)
                return _ms.render(scene, scene_config, cam,
                                  batch.image_idx[0], probe_cfg).sat_demand

            probe = jax.jit(_sat_probe)
            sdem = max(int(np.asarray(probe(b))) for b in batches)
            msat = min(ladder_fit(int(sdem * 1.3), mr_b), mr_b)
            print(f"# sat probe: demand {sdem} -> capacity {msat}")
            cand = _dc.replace(best_rcfg, max_sat_instances=msat)
            t = try_measure(f"sat{msat}", cand)
            if t is not None and t <= best_dt * TUNE_MARGIN:
                best_dt, best_rcfg, best_label = t, cand, f"sat{msat}"
        except Exception as e:
            print(f"# sat probe FAILED ({type(e).__name__}: {e})"[:300])
        # (3) tile_size 64: never probed at this workload. Measured span
        # stats at the 1M checkpoint (2026-08-21): ts64 HALVES instance
        # demand (2.45M -> 1.31M AABB, expansion 4.04 -> 2.16), and r3
        # showed the stream ops dominate kernel waste at this scale (ts32
        # beat ts16) — so keep walking coarser: if ts64 wins at all,
        # escalate to ts128 (demand 0.89M) and a chunk-64 variant.
        if rcfg.tile_size == 32:
            def _ts_probe(ts, tpb, k=None):
                try:
                    base_v = _dc.replace(rcfg_base, tile_size=ts)
                    if k is not None:
                        base_v = _dc.replace(base_v, chunk_size=k)
                    cand = _dc.replace(bucketed(base_v)[0],
                                       tiles_per_block=tpb)
                    label = f"ts{ts} tpb{tpb}" + (f" k{k}" if k else "")
                    return label, cand, try_measure(label, cand)
                except Exception as e:
                    print(f"# ts{ts} probe FAILED "
                          f"({type(e).__name__}: {e})"[:300])
                    return None, None, None
            label, cand, t = _ts_probe(
                64, max(1, rcfg.tiles_per_block // 4))
            if t is not None and t < best_dt:
                if t <= best_dt * TUNE_MARGIN:
                    best_dt, best_rcfg, best_label = t, cand, label
                for label2, cand2, t2 in (
                        _ts_probe(64, max(1, rcfg.tiles_per_block // 4),
                                  k=64),
                        _ts_probe(128, 1)):
                    if t2 is not None and t2 <= best_dt * TUNE_MARGIN:
                        best_dt, best_rcfg, best_label = t2, cand2, label2
        # (4) batch>1: one optimizer step per B images amortizes the
        # per-step fixed cost (optimizer + stats + dispatch). Metric is
        # img/s so this raises the headline directly — but it changes the
        # effective batch, so adoption is gated on the garden-scale
        # quality A/B (runs/ab_batch4) like the bf16 scan knobs were.
        if n_cams >= 4:
            b4_ok = _quality_ab_pass("batch4")
            tag = ("quality A/B passed" if b4_ok
                   else "info: no quality-A/B pass recorded; not adopted")
            t = try_measure(f"batch4 ({tag})", best_rcfg, bs=4)
            if t is not None and b4_ok and t < best_dt * REPEAT_MARGIN:
                best_dt, best_label, best_bs = t, f"{best_label} + batch4", 4
        # All adoption-capable probes are done — lock in the headline
        # before spending budget on info-only probes.
        _remeasure_emit()
        # (5) alpha_threshold (approximation-class: drops splats whose peak
        # alpha is below the threshold): 2/255 measured -25% visible /
        # -31% demand at checkpoint_30000, the largest instance-count
        # lever on the table. Quality-gated on runs/ab_alpha* like the
        # bf16/batch knobs; probed info-only without a pass. Rebucketed —
        # the whole point is the smaller capacities.
        for arm, at in (("alpha2", 2.0 / 255), ("alpha4", 4.0 / 255),
                        ("alpha8", 8.0 / 255)):
            a_ok = _quality_ab_pass(arm)
            tag = ("quality A/B passed" if a_ok
                   else "info: no quality-A/B pass recorded; not adopted")
            try:
                b_al = bucketed(_dc.replace(
                    rcfg_base, tile_size=best_rcfg.tile_size,
                    alpha_threshold=at))[0]
                cand = _dc.replace(
                    best_rcfg, alpha_threshold=at,
                    max_instances=b_al.max_instances,
                    max_render_instances=b_al.max_render_instances)
                t = try_measure(f"{arm} ({tag})", cand, bs=best_bs)
                if t is not None and a_ok and t <= best_dt * TUNE_MARGIN:
                    best_dt, best_rcfg = t, cand
                    best_label = f"{best_label} + {arm}"
            except Exception as e:
                print(f"# {arm} probe FAILED ({type(e).__name__}: {e})"[:300])

    # ---- re-measure + re-emit if the info-only stage adopted anything -----
    # (quality-passed alpha rungs would land here; no-op otherwise)
    _remeasure_emit()

    # ---- PROFILE.md -------------------------------------------------------
    final = _last_result
    images_per_sec = final["value"]
    ab_md = "\n".join(
        f"| {name}{' (B=' + str(bs) + ')' if bs != 1 else ''} | "
        f"{'FAILED' if t is None else f'{t*1e3:.2f}'} |"
        for name, _, t, bs in ab_table) or "| (none probed) | |"
    roofline_md = "\n".join(
        f"| {r['phase']} | {r['ms']:.1f} | {r['gflops']:.1f} | {r['gb']:.2f} "
        f"| {r['pct_flops']:.1f}% | {r['pct_hbm']:.1f}% |" for r in rows)
    have_phases = "project_bin" in phases

    def ph(k):
        return phases.get(k, 0.0) * 1e3

    profile = Path("PROFILE.md")
    profile.write_text(f"""# Step-time profile (bench.py)

Measured on `{jax.devices()[0].device_kind}` at {w}x{h}, scene:
{"checkpoint" if loaded else "fallback surface cloud"},
{n_active} active points.

| phase | ms | notes |
|---|---|---|
| project + bin + sort | {ph('project_bin'):.2f} | projection, tile expand, key sort (M={rcfg.max_instances}) |
| render forward | {ph('render_fwd'):.2f} | binning + color eval + pallas compositing (Mr={rcfg.max_render_instances}) |
| ssim fwd+bwd | {ph('ssim_fwd_bwd'):.2f} | 3-level, f32 banded matmuls |
| full grads (fwd+bwd) | {ph('grads_fwd_bwd'):.2f} | render + losses + custom VJP |
| **full train step** | **{dt_img*1e3:.2f}** | per image, incumbent config |

{"(phase rows are 0.00 — the phase stage was budget-skipped this run)" if not have_phases else ""}

Headline config: {final.get('config')}, {images_per_sec:.2f} img/s/chip.
Incumbent config: tile_size={rcfg.tile_size}, tiles_per_block={rcfg.tiles_per_block},
chunk_size={rcfg.chunk_size}, max_sat_instances={rcfg.max_sat_instances},
grad_bf16_pack={rcfg.grad_bf16_pack} (never auto-enabled).

## Auto-tune A/B (pruned probe set; chained loops, fresh scene copy each)

Retired after three losing rounds (VERDICT r4 #7): kernel_basis,
cumprod_scan, exit_bands, chunk256, tpb16, bwd_moments,
grad_pack_in_kernel. Remaining probes:

| candidate | ms/image |
|---|---|
{ab_md}

{chr(10).join("Margin rule: " + n for n in margin_notes) if margin_notes else "Margin rule: no knob was within the 3% noise band of the incumbent."}

Occupancy: {json.dumps(occ)}
Clipped instances during the timed steps: {clipped_step}.

## Roofline attribution (modeled FLOPs/bytes vs v5e peaks: 49 f32 TFLOPS, 819 GB/s)

| phase | ms | GFLOP | GB | % f32 peak | % HBM peak |
|---|---|---|---|---|---|
{roofline_md or "| (budget-skipped) | | | | | |"}

Reading: every phase sits far below BOTH peaks — the pipeline is
dominated by per-element gather/scatter/sort latency over the
instance-capacity-sized arrays (XLA TPU gathers measure ~8 ns/element),
not by compute or bandwidth. That is why optimization rounds target the
NUMBER and SIZE of M-shaped operations (opacity-aware radius, exact
ellipse cull + compaction, gather-free realign, capacity bucketing)
rather than kernel micro-tuning: the Pallas composite kernels themselves
run in ~10% of the step.

Throughput: **{images_per_sec:.2f} images/sec/chip** (baseline A100
taichi-splatting ~{BASELINE_IMAGES_PER_SEC}) on THIS workload:
{w}x{h}, {n_active} active points
({"garden-class" if garden_class else "SUB-GARDEN — not comparable to the garden baseline"}).

## Remaining-gap attribution (target >=3x baseline = 36 img/s = {1000/(3*BASELINE_IMAGES_PER_SEC):.1f} ms/image)

| component | ms (measured, this run) |
|---|---|
| project + bin + sort | {ph('project_bin'):.1f} |
| forward kernel + color eval | {ph('render_fwd')-ph('project_bin'):.1f} |
| ssim fwd+bwd | {ph('ssim_fwd_bwd'):.1f} |
| backward kernel + grad reduce | {max(ph('grads_fwd_bwd')-ph('render_fwd')-ph('ssim_fwd_bwd'),0):.1f} |
| optimizer + statistics | {max(dt_img*1e3-ph('grads_fwd_bwd'),0):.1f} |
| **total step (per image)** | **{dt_img*1e3:.1f}** |
| gap to 3x target | {dt_img*1e3 - 1000/(3*BASELINE_IMAGES_PER_SEC):+.1f} |
""")

    # the LAST stdout line is always the headline
    print(json.dumps(final), flush=True)


if __name__ == "__main__":
    main()
