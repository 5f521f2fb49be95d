"""Visual debug tools: view clustering / batch selection / camera layout.

Headless counterparts of the reference's viser-based debuggers
(/root/reference/splat_trainer/scripts/view_batching.py,
view_clusters.py, util/view_cameras.py): instead of an interactive 3D
window (viser/pyrender unavailable here), each tool writes PNG figures
into the run directory — point cloud colored by k-means cluster, the
view-similarity matrix, sampled batch footprints, and the camera layout.

Usage:
    python -m splat_trainer_tpu.scripts.view_debug clusters <run_dir>
    python -m splat_trainer_tpu.scripts.view_debug batching <run_dir> [--batches 12]
    python -m splat_trainer_tpu.scripts.view_debug cameras <run_dir>
    python -m splat_trainer_tpu.scripts.view_debug frustums <run_dir> [--highlight 2]
"""

import argparse
from pathlib import Path

import numpy as np


def _load_trainer(workspace: Path):
    import os

    from splat_trainer_tpu.config.loader import instantiate, load_config
    from splat_trainer_tpu.logger import NullLogger
    from splat_trainer_tpu.scripts.train import build_dataset
    from splat_trainer_tpu.trainer import checkpoint as ckpt
    from splat_trainer_tpu.trainer.trainer import Trainer

    tree = load_config(workspace / "config.yaml")
    dataset = build_dataset(tree["dataset"])
    config = instantiate(tree["trainer"])
    os.chdir(workspace)
    trainer = Trainer.initialize(config, dataset, NullLogger())
    path = ckpt.find_latest_checkpoint(workspace)
    if path is not None:
        state = ckpt.load_checkpoint(path, trainer.scene, trainer.pstate)
        trainer = Trainer.from_state_dict(config, dataset, NullLogger(), state)
        print(f"loaded {path}")
    return trainer


def _fig(path, title):
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    fig = plt.figure(figsize=(8, 6))
    fig.suptitle(title)
    return plt, fig


def _save(plt, fig, out: Path):
    fig.tight_layout()
    fig.savefig(out, dpi=120)
    plt.close(fig)
    print(f"wrote {out}")


def _camera_positions(trainer):
    return np.asarray(trainer.camera_table.cameras.positions)


def clusters_main(argv=None):
    p = argparse.ArgumentParser(description="point k-means cluster debugger")
    p.add_argument("workspace")
    p.add_argument("--clusters", type=int, default=64)
    args = p.parse_args(argv)
    workspace = Path(args.workspace).absolute()
    trainer = _load_trainer(workspace)

    import jax
    from splat_trainer_tpu.visibility import cluster

    pc = cluster.PointClusters.cluster(
        trainer.scene.points["position"], args.clusters,
        active=trainer.scene.active, key=jax.random.PRNGKey(0))
    active = np.asarray(trainer.scene.active)
    pos = np.asarray(trainer.scene.points["position"])[active]
    labels = np.asarray(pc.point_labels)[active]

    plt, fig = _fig(workspace, f"{args.clusters} point clusters "
                               f"({active.sum()} points)")
    for i, (a, b, name) in enumerate([(0, 2, "x/z (top)"), (0, 1, "x/y (front)")]):
        ax = fig.add_subplot(1, 2, i + 1)
        ax.scatter(pos[:, a], pos[:, b], c=labels % 20, cmap="tab20", s=1)
        cams = _camera_positions(trainer)
        ax.scatter(cams[:, a], cams[:, b], c="k", marker="^", s=30)
        ax.set_title(name)
        ax.set_aspect("equal")
        if b == 1:
            ax.invert_yaxis()  # y-down worlds plot upright
    _save(plt, fig, workspace / "debug_clusters.png")


def batching_main(argv=None):
    p = argparse.ArgumentParser(description="view-overlap batching debugger")
    p.add_argument("workspace")
    p.add_argument("--batches", type=int, default=12)
    p.add_argument("--batch-size", type=int, default=4)
    args = p.parse_args(argv)
    workspace = Path(args.workspace).absolute()
    trainer = _load_trainer(workspace)

    trainer.dataset.load_images()
    if trainer.view_clustering is None:
        trainer.evaluate_training("train", trainer.dataset.train())
    vc = trainer.view_clustering
    sim = np.asarray(vc.view_similarity)

    from splat_trainer_tpu.trainer.view_selection import BatchOverlapSamplerConfig
    sampler = BatchOverlapSamplerConfig(batch_size=args.batch_size).create(
        trainer.camera_table.train_indices(), seed=0)
    batches = [sampler.select_images(vc, trainer.progress)
               for _ in range(args.batches)]

    plt, fig = _fig(workspace, "view-overlap batching")
    ax = fig.add_subplot(1, 2, 1)
    im = ax.imshow(sim, cmap="viridis")
    ax.set_title("view similarity")
    fig.colorbar(im, ax=ax, fraction=0.046)

    ax = fig.add_subplot(1, 2, 2)
    cams = _camera_positions(trainer)
    ax.scatter(cams[:, 0], cams[:, 2], c="lightgray", s=25)
    cmap = plt.get_cmap("tab10")
    train_idx = np.asarray(trainer.camera_table.train_indices())
    local = {int(g): i for i, g in enumerate(train_idx)}
    for bi, batch in enumerate(batches[: args.batches]):
        pts = cams[np.asarray(batch)]
        ax.plot(pts[:, 0], pts[:, 2], "o-", color=cmap(bi % 10), alpha=0.7,
                markersize=5)
    ax.set_title(f"{args.batches} sampled batches (size {args.batch_size})")
    ax.set_aspect("equal")
    del local
    _save(plt, fig, workspace / "debug_batching.png")


def cameras_main(argv=None):
    p = argparse.ArgumentParser(description="camera layout debugger")
    p.add_argument("workspace")
    args = p.parse_args(argv)
    workspace = Path(args.workspace).absolute()
    trainer = _load_trainer(workspace)

    cams = trainer.camera_table.cameras
    pos = np.asarray(cams.positions)
    # forward vectors: camera z axis in world coords
    fwd = np.asarray(cams.camera_t_world)[:, 2, :3]
    train = np.asarray(trainer.camera_table.train_indices())
    is_train = np.isin(np.arange(pos.shape[0]), train)

    plt, fig = _fig(workspace, f"{pos.shape[0]} cameras "
                               f"({is_train.sum()} train)")
    for i, (a, b, name) in enumerate([(0, 2, "x/z (top)"), (0, 1, "x/y (front)")]):
        ax = fig.add_subplot(1, 2, i + 1)
        ax.quiver(pos[:, a], pos[:, b], fwd[:, a], fwd[:, b],
                  color=np.where(is_train, "tab:blue", "tab:red"),
                  angles="xy", width=0.004)
        ax.set_title(name)
        ax.set_aspect("equal")
        if b == 1:
            ax.invert_yaxis()
    _save(plt, fig, workspace / "debug_cameras.png")


def frustums_main(argv=None):
    """3D camera-frustum scene: wireframe frusta over the scene cloud,
    with per-camera visible-point highlighting.

    Headless counterpart of the reference's interactive pyrender frustum
    viewer (/root/reference/splat_trainer/util/view_cameras.py:150-214:
    frustum mesh per camera + point cloud, keyboard camera stepping with
    visible points highlighted via point_visibility). pyrender/viser are
    unavailable here, so this renders the same scene content to a PNG:
    every camera as a wireframe frustum (apex -> image-plane rectangle at
    a fraction of its far plane), the scene point cloud subsampled, and —
    with --highlight <idx> — the points visible from that camera colored
    by the same point_visibility query the reference uses."""
    p = argparse.ArgumentParser(description="camera frustum scene debugger")
    p.add_argument("workspace")
    p.add_argument("--highlight", type=int, default=None,
                   help="camera index whose visible points are highlighted")
    p.add_argument("--depth-frac", type=float, default=0.15,
                   help="frustum depth as a fraction of each camera's far")
    p.add_argument("--max-points", type=int, default=20000)
    args = p.parse_args(argv)
    workspace = Path(args.workspace).absolute()
    trainer = _load_trainer(workspace)

    cams = trainer.camera_table.cameras
    w, h = trainer.camera_table.image_size
    T_cw = np.asarray(cams.camera_t_world)           # (N, 4, 4) world->camera
    K = np.asarray(cams.intrinsics)                  # (N, 4) fx fy cx cy
    depth = np.asarray(cams.depth_range)
    n = T_cw.shape[0]
    train = np.asarray(trainer.camera_table.train_indices())
    is_train = np.isin(np.arange(n), train)

    # frustum corners: unproject the image corners at d, camera -> world
    R = T_cw[:, :3, :3]
    t = T_cw[:, :3, 3]
    centers = -np.einsum("nij,nj->ni", R.transpose(0, 2, 1), t)  # (N, 3)
    # frustum depth: fraction of far, capped at a quarter of the camera
    # cloud's radius so wide-far scenes stay legible
    cam_radius = float(np.linalg.norm(
        centers - centers.mean(0), axis=-1).max()) or 1.0
    d = np.minimum(args.depth_frac * depth[:, 1], 0.25 * cam_radius)
    corners_px = np.array([[0, 0], [w, 0], [w, h], [0, h]], np.float32)
    segs = []
    for i in range(n):
        fx, fy, cx, cy = K[i]
        rays = np.stack([(corners_px[:, 0] - cx) / fx,
                         (corners_px[:, 1] - cy) / fy,
                         np.ones(4)], axis=-1) * d[i]         # camera space
        world = rays @ R[i] + centers[i][None]                # R^T rays + c
        for j in range(4):
            segs.append([centers[i], world[j]])               # apex edges
            segs.append([world[j], world[(j + 1) % 4]])       # far rectangle
        # up tick: mark the top edge so roll is visible
        segs.append([(world[0] + world[1]) / 2,
                     (world[0] + world[1]) / 2
                     + 0.2 * np.cross(world[1] - world[0],
                                      centers[i] - world[0])
                     / max(np.linalg.norm(world[1] - world[0]), 1e-6)])

    import jax.numpy as jnp
    pts = np.asarray(trainer.scene.points["position"])
    active = np.asarray(trainer.scene.active)
    pts = pts[active]
    if pts.shape[0] > args.max_points:
        sel = np.random.default_rng(0).choice(pts.shape[0], args.max_points,
                                              replace=False)
        pts = pts[sel]

    vis = None
    if args.highlight is not None:
        import jax

        from splat_trainer_tpu.visibility.query_points import point_visibility
        sub = jax.tree_util.tree_map(
            lambda x: x[args.highlight:args.highlight + 1], cams)
        vis = np.asarray(point_visibility(sub, (w, h), jnp.asarray(pts))) > 0

    plt, fig = _fig(workspace, f"{n} camera frusta "
                               f"({int(is_train.sum())} train)")
    from mpl_toolkits.mplot3d.art3d import Line3DCollection
    ax = fig.add_subplot(111, projection="3d")
    per_cam = 9
    cam_color = ["tab:green" if i == args.highlight
                 else ("tab:blue" if is_train[i] else "tab:red")
                 for i in range(n)]
    colors = [c for c in cam_color for _ in range(per_cam)]
    ax.add_collection3d(Line3DCollection(segs, colors=colors, linewidths=0.7))
    if vis is not None:
        ax.scatter(*pts[~vis].T, s=0.3, c="0.75", depthshade=False)
        ax.scatter(*pts[vis].T, s=0.5, c="tab:green", depthshade=False)
    else:
        ax.scatter(*pts.T, s=0.3, c="0.6", depthshade=False)
    lo = np.minimum(pts.min(0), centers.min(0))
    hi = np.maximum(pts.max(0), centers.max(0))
    mid, rad = (lo + hi) / 2, (hi - lo).max() / 2
    ax.set_xlim(mid[0] - rad, mid[0] + rad)
    ax.set_ylim(mid[1] - rad, mid[1] + rad)
    ax.set_zlim(mid[2] - rad, mid[2] + rad)
    ax.view_init(elev=-60, azim=-90)   # y-down datasets look upright
    _save(plt, fig, workspace / "debug_frustums.png")


def main(argv=None):
    import sys
    argv = list(sys.argv[1:] if argv is None else argv)
    if not argv or argv[0] not in ("clusters", "batching", "cameras",
                                   "frustums"):
        print(__doc__)
        return
    cmd, rest = argv[0], argv[1:]
    {"clusters": clusters_main, "batching": batching_main,
     "cameras": cameras_main, "frustums": frustums_main}[cmd](rest)


if __name__ == "__main__":
    main()
