"""Dataset tests: COLMAP round-trip (via to_colmap export), rig scans,
ply IO, normalization."""

import json
import os

import numpy as np
import pytest

from splat_trainer_tpu.data.synthetic import SyntheticDataset


@pytest.fixture(scope="module")
def synthetic():
    return SyntheticDataset(num_images=6, image_size=(32, 32), num_points=100)


def test_colmap_roundtrip(synthetic, tmp_path):
    """Export synthetic -> COLMAP text model -> read back with our parser."""
    from splat_trainer_tpu.data.colmap import COLMAPDataset
    from splat_trainer_tpu.data.normalization import NormalizationConfig
    from splat_trainer_tpu.scripts.to_colmap import export_colmap

    export_colmap(synthetic, tmp_path, write_images=True)

    ds = COLMAPDataset(str(tmp_path), image_scale=1.0, resize_longest=None,
                       split_every=3,
                       normalize=NormalizationConfig(centering=False))
    assert ds.camera_table.num_images == 6
    # poses survive the round trip
    np.testing.assert_allclose(
        np.asarray(ds.camera_table.cameras.camera_t_world),
        np.asarray(synthetic.camera_table.cameras.camera_t_world), atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(ds.camera_table.cameras.intrinsics),
        np.asarray(synthetic.camera_table.cameras.intrinsics), atol=1e-3)
    # images load
    views = ds.loader([0, 1])
    assert views[0].image.shape == (32, 32, 3)
    # point cloud survives
    cloud = ds.pointcloud()
    assert cloud.num_points == 100


def test_rig_scan_dataset(tmp_path):
    import cv2

    from splat_trainer_tpu.data.scan import RigScanDataset

    # two cameras, three frames
    k = [[40.0, 0, 16], [0, 40.0, 16], [0, 0, 1]]
    cameras = {}
    for ci, name in enumerate(["left", "right"]):
        offset = np.eye(4)
        offset[0, 3] = ci * 0.2
        cameras[name] = {"width": 32, "height": 32, "K": k,
                         "dist": [0, 0, 0, 0, 0],
                         "camera_t_rig": offset.tolist()}

    frames = []
    (tmp_path / "imgs").mkdir()
    for fi in range(3):
        pose = np.eye(4)
        pose[2, 3] = fi * 0.5
        images = {}
        for name in cameras:
            rel = f"imgs/f{fi}_{name}.png"
            cv2.imwrite(str(tmp_path / rel),
                        np.full((32, 32, 3), 50 * fi + 10, np.uint8))
            images[name] = rel
        frames.append({"rig_t_world": pose.tolist(), "images": images})

    with open(tmp_path / "scan.json", "w") as f:
        json.dump({"cameras": cameras, "frames": frames}, f)

    from splat_trainer_tpu.data.normalization import NormalizationConfig
    ds = RigScanDataset(str(tmp_path / "scan.json"), val_stride=0,
                        normalize=NormalizationConfig(centering=False))
    assert ds.camera_table.num_images == 6
    assert ds.camera_table.rig is not None
    views = ds.loader([0, 5])
    assert views[0].image.shape == (32, 32, 3)
    # rig composition: image (f, c) pose = camera_t_rig[c] @ rig_t_world[f]
    m = np.asarray(ds.camera_table.cameras.camera_t_world)
    expected = np.asarray(cameras["right"]["camera_t_rig"]) @ np.asarray(
        frames[2]["rig_t_world"])
    np.testing.assert_allclose(m[5], expected, atol=1e-5)


def test_gaussians_ply_roundtrip(tmp_path):
    from splat_trainer_tpu.models.io import (
        random_gaussians_np, read_gaussians, write_gaussians,
    )

    g = random_gaussians_np(50, sh_degree=2)
    path = tmp_path / "g.ply"
    write_gaussians(path, g, with_sh=True)
    g2 = read_gaussians(path, with_sh=True)

    np.testing.assert_allclose(g2.position, g.position, atol=1e-6)
    np.testing.assert_allclose(g2.rotation, g.rotation, atol=1e-6)
    np.testing.assert_allclose(g2.log_scaling, g.log_scaling, atol=1e-6)
    np.testing.assert_allclose(g2.alpha_logit, g.alpha_logit, atol=1e-6)
    np.testing.assert_allclose(g2.feature, g.feature, atol=1e-6)


def test_normalization_inverse():
    from splat_trainer_tpu.data.normalization import (
        Normalization, NormalizationConfig,
    )

    rng = np.random.RandomState(0)
    centers = rng.normal(size=(10, 3)).astype(np.float32)
    norm = Normalization.from_cameras(
        NormalizationConfig(centering=True, scaling_method="median_knn",
                            normalize_knn=3), centers)
    pts = rng.normal(size=(20, 3)).astype(np.float32)
    back = norm.inverse.transform_points(norm.transform_points(pts))
    np.testing.assert_allclose(back, pts, atol=1e-5)

    # camera transform consistency: normalized camera sees normalized points
    # at the same pixel as the original camera sees the original points
    r = np.linalg.qr(rng.normal(size=(3, 3)))[0].astype(np.float32)
    if np.linalg.det(r) < 0:
        r[:, 0] *= -1
    m = np.eye(4, dtype=np.float32)
    m[:3, :3] = r
    m[:3, 3] = rng.normal(size=3)
    m2 = norm.transform_rigid(m[None])[0]

    p = pts[0]
    pn = norm.transform_points(p)
    cam_orig = r @ p + m[:3, 3]
    cam_norm = m2[:3, :3] @ pn + m2[:3, 3]
    np.testing.assert_allclose(cam_norm / cam_norm[2],
                               cam_orig / cam_orig[2], atol=1e-4)


def test_colmap_bin_native_parity(tmp_path):
    """points3D.bin / images.bin: the native C++ parser and the pure-Python
    struct loop must agree exactly (variable-length track/2D blocks)."""
    import struct

    from splat_trainer_tpu.data.colmap import native, reader

    rng = np.random.RandomState(3)
    n_pts, n_imgs = 257, 5

    p3d = tmp_path / "points3D.bin"
    with open(p3d, "wb") as f:
        f.write(struct.pack("<Q", n_pts))
        for i in range(n_pts):
            track_len = int(rng.randint(0, 7))
            f.write(struct.pack("<Q", i))
            f.write(struct.pack("<3d", *rng.randn(3)))
            f.write(struct.pack("<3B", *rng.randint(0, 256, 3)))
            f.write(struct.pack("<d", rng.rand()))
            f.write(struct.pack("<Q", track_len))
            for t in range(track_len):
                f.write(struct.pack("<ii", t, t + 1))

    imgs = tmp_path / "images.bin"
    names = [f"frame_{i:04d}.png" for i in range(n_imgs)]
    with open(imgs, "wb") as f:
        f.write(struct.pack("<Q", n_imgs))
        for i in range(n_imgs):
            n2d = int(rng.randint(0, 9))
            f.write(struct.pack("<i", 10 + i))
            f.write(struct.pack("<4d", *rng.randn(4)))
            f.write(struct.pack("<3d", *rng.randn(3)))
            f.write(struct.pack("<i", i % 2))
            f.write(names[i].encode() + b"\x00")
            f.write(struct.pack("<Q", n2d))
            for t in range(n2d):
                f.write(struct.pack("<ddq", 0.5 * t, 0.25 * t, t))

    if not native.available():
        import pytest
        pytest.skip("native toolchain unavailable")

    nat_xyz, nat_rgb = native.read_points3d_bin(p3d)
    # force the pure-python fallback by monkey-free direct loop comparison
    import splat_trainer_tpu.data.colmap.native as natmod
    saved = natmod._LIB, natmod._TRIED
    try:
        natmod._LIB, natmod._TRIED = None, True
        py_xyz, py_rgb = reader.read_points3d_bin(p3d)
        py_images = reader.read_images_bin(imgs)
    finally:
        natmod._LIB, natmod._TRIED = saved

    np.testing.assert_allclose(nat_xyz, py_xyz, rtol=1e-6)
    np.testing.assert_allclose(nat_rgb, py_rgb, rtol=1e-6)

    nat_images = reader.read_images_bin(imgs)  # native path
    assert len(nat_images) == len(py_images) == n_imgs
    for a, b in zip(nat_images, py_images):
        assert a.image_id == b.image_id and a.camera_id == b.camera_id
        assert a.name == b.name
        np.testing.assert_allclose(a.qvec, b.qvec)
        np.testing.assert_allclose(a.tvec, b.tvec)


def test_blender_fixture_roundtrip(synthetic, tmp_path):
    """Synthetic cameras -> NeRF-synthetic transforms_{train,val}.json +
    PNGs -> BlenderDataset reads back the same poses/intrinsics/splits
    (BASELINE.md config 2's ingest path; the loaders previously had no
    fixture test — VERDICT r2)."""
    import cv2

    from splat_trainer_tpu.data.blender import BlenderDataset

    table = synthetic.camera_table
    w, h = table.image_size
    fx = float(np.asarray(table.cameras.intrinsics[0, 0]))
    camera_angle_x = 2.0 * np.arctan(0.5 * w / fx)

    gl = np.diag([1.0, -1.0, -1.0, 1.0]).astype(np.float32)
    (tmp_path / "train").mkdir()

    def frame(i):
        w2c = np.asarray(table.cameras.camera_t_world[i])
        c2w = np.linalg.inv(w2c) @ gl          # CV -> OpenGL convention
        name = f"train/r_{i}"
        img = synthetic.loader([i])[0].image
        cv2.imwrite(str(tmp_path / f"{name}.png"),
                    cv2.cvtColor(img, cv2.COLOR_RGB2BGR))
        return {"file_path": name, "transform_matrix": c2w.tolist()}

    n = table.num_images
    n_train = n - 2
    meta_tr = {"camera_angle_x": camera_angle_x,
               "frames": [frame(i) for i in range(n_train)]}
    meta_va = {"camera_angle_x": camera_angle_x,
               "frames": [frame(i) for i in range(n_train, n)]}
    (tmp_path / "transforms_train.json").write_text(json.dumps(meta_tr))
    (tmp_path / "transforms_val.json").write_text(json.dumps(meta_va))

    ds = BlenderDataset(str(tmp_path))
    bt = ds.camera_table
    assert bt.num_images == n
    assert bt.image_size == (w, h)
    assert len(ds.train()) == n_train and len(ds.val()) == 2

    # poses survive the OpenGL round-trip exactly (up to inversion noise)
    np.testing.assert_allclose(
        np.asarray(bt.cameras.camera_t_world),
        np.asarray(table.cameras.camera_t_world), atol=1e-4)
    # fx reconstructed from camera_angle_x; principal point at the center
    np.testing.assert_allclose(
        np.asarray(bt.cameras.intrinsics[:, 0]), fx, rtol=1e-5)
    # images decode as RGB uint8 at the declared size
    img = ds.loader([0])[0].image
    assert img.shape == (h, w, 3) and img.dtype == np.uint8
    np.testing.assert_array_equal(img, synthetic.loader([0])[0].image)

    # image_scale resizes both the table and the decoded images
    ds_half = BlenderDataset(str(tmp_path), image_scale=0.5)
    assert ds_half.camera_table.image_size == (w // 2, h // 2)
    assert ds_half.loader([0])[0].image.shape == (h // 2, w // 2, 3)
