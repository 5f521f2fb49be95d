"""Export a rig-scan dataset to COLMAP text-model format.

Capability equivalent of /root/reference/splat_trainer/scripts/
to_colmap.py:70-158: write cameras.txt / images.txt / points3D.txt +
undistorted images so COLMAP-based tools can consume scan captures.
"""

import argparse
import os
from pathlib import Path

import numpy as np


def rotmat_to_qvec(r: np.ndarray) -> np.ndarray:
    """3x3 -> COLMAP wxyz quaternion."""
    m00, m01, m02 = r[0]
    m10, m11, m12 = r[1]
    m20, m21, m22 = r[2]
    tr = m00 + m11 + m22
    if tr > 0:
        s = np.sqrt(tr + 1.0) * 2
        return np.array([0.25 * s, (m21 - m12) / s, (m02 - m20) / s,
                         (m10 - m01) / s])
    if m00 > m11 and m00 > m22:
        s = np.sqrt(1.0 + m00 - m11 - m22) * 2
        return np.array([(m21 - m12) / s, 0.25 * s, (m01 + m10) / s,
                         (m02 + m20) / s])
    if m11 > m22:
        s = np.sqrt(1.0 + m11 - m00 - m22) * 2
        return np.array([(m02 - m20) / s, (m01 + m10) / s, 0.25 * s,
                         (m12 + m21) / s])
    s = np.sqrt(1.0 + m22 - m00 - m11) * 2
    return np.array([(m10 - m01) / s, (m02 + m20) / s, (m12 + m21) / s,
                     0.25 * s])


def export_colmap(dataset, out_dir: Path, write_images: bool = True):
    """Write any Dataset (camera table + images + cloud) as a COLMAP model."""
    import cv2

    sparse = out_dir / "sparse" / "0"
    sparse.mkdir(parents=True, exist_ok=True)
    images_dir = out_dir / "images"
    images_dir.mkdir(parents=True, exist_ok=True)

    table = dataset.camera_table
    cams = table.cameras
    w, h = table.image_size
    intr = np.asarray(cams.intrinsics)
    cam_idx = np.asarray(cams.camera_idx)
    poses = np.asarray(cams.camera_t_world)

    # one COLMAP camera per unique projection
    unique = sorted(set(cam_idx.tolist()))
    with open(sparse / "cameras.txt", "w") as f:
        f.write("# camera_id model width height params\n")
        for u in unique:
            i = int(np.nonzero(cam_idx == u)[0][0])
            fx, fy, cx, cy = intr[i]
            f.write(f"{u + 1} PINHOLE {w} {h} {fx} {fy} {cx} {cy}\n")

    names = table.image_names or [f"{i:05d}.png" for i in range(cams.num_images)]
    with open(sparse / "images.txt", "w") as f:
        f.write("# image_id qw qx qy qz tx ty tz camera_id name\n# points2d\n")
        for i in range(cams.num_images):
            q = rotmat_to_qvec(poses[i, :3, :3])
            t = poses[i, :3, 3]
            name = str(names[i]).replace("/", "_")
            if not name.lower().endswith((".png", ".jpg", ".jpeg")):
                name += ".png"
            f.write(f"{i + 1} {q[0]} {q[1]} {q[2]} {q[3]} "
                    f"{t[0]} {t[1]} {t[2]} {int(cam_idx[i]) + 1} {name}\n\n")

    cloud = dataset.pointcloud()
    with open(sparse / "points3D.txt", "w") as f:
        f.write("# point3d_id x y z r g b error track\n")
        if cloud is not None:
            cols = (np.clip(cloud.colors * 255, 0, 255).astype(int)
                    if cloud.colors is not None
                    else np.full((cloud.num_points, 3), 128))
            for i in range(cloud.num_points):
                x, y, z = cloud.points[i]
                r, g, b = cols[i]
                f.write(f"{i + 1} {x} {y} {z} {r} {g} {b} 1.0\n")

    if write_images:
        views = dataset.loader(np.arange(cams.num_images))
        for i, v in enumerate(views):
            name = str(names[i]).replace("/", "_")
            if not name.lower().endswith((".png", ".jpg", ".jpeg")):
                name += ".png"
            cv2.imwrite(str(images_dir / name),
                        cv2.cvtColor(v.image, cv2.COLOR_RGB2BGR))
    print(f"exported COLMAP model to {out_dir}")


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("scan_file", help="rig scan.json")
    p.add_argument("output", help="output COLMAP dir")
    p.add_argument("--image-scale", type=float, default=1.0)
    p.add_argument("--no-images", action="store_true")
    args = p.parse_args(argv)

    from splat_trainer_tpu.data.scan import RigScanDataset
    dataset = RigScanDataset(args.scan_file, image_scale=args.image_scale)
    dataset.load_images()
    export_colmap(dataset, Path(args.output), write_images=not args.no_images)


if __name__ == "__main__":
    main()
