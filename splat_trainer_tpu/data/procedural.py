"""Procedural ray-traced multi-view dataset — the offline stand-in for the
real-capture milestone scenes (BASELINE.md milestones 2-3).

The build environment has no network egress and no NeRF-synthetic /
Mip-NeRF-360 data on disk, so quality milestones are run against this
scene instead: a deterministic textured "courtyard" (noise-textured ground,
a dozen matte/shiny spheres casting hard shadows, procedural sky) rendered
by an INDEPENDENT vectorized ray tracer — not the splat renderer — so PSNR
against it measures real reconstruction quality, not self-consistency.

Knobs for the milestone-4 experiments:
- `appearance_jitter`: per-image exposure / white-balance variation in
  linear space (what GLO embeddings + the bilateral corrector must absorb).
- `pose_noise`: perturbs the camera table (NOT the images), so the poses the
  trainer sees are wrong by a known amount — pose refinement must recover.
"""

from dataclasses import dataclass
from typing import List, Optional, Sequence

import numpy as np

from splat_trainer_tpu.cameras.camera_table import CameraTable, Label, MultiCameraTable
from splat_trainer_tpu.data import dataset as ds
from splat_trainer_tpu.utils.pointcloud import PointCloud


# -- procedural textures -----------------------------------------------------


def _hash01(ix: np.ndarray, iz: np.ndarray, seed: int) -> np.ndarray:
    h = (ix.astype(np.int64) * 374761393 + iz.astype(np.int64) * 668265263
         + np.int64(seed) * 1442695041) & 0xFFFFFFFF
    h = ((h ^ (h >> 13)) * 1274126177) & 0xFFFFFFFF
    return (((h ^ (h >> 16)) & 0xFFFF).astype(np.float32)) / 65535.0


def _value_noise(x: np.ndarray, z: np.ndarray, seed: int) -> np.ndarray:
    ix, iz = np.floor(x), np.floor(z)
    fx, fz = x - ix, z - iz
    sx = fx * fx * (3 - 2 * fx)
    sz = fz * fz * (3 - 2 * fz)
    n00 = _hash01(ix, iz, seed)
    n10 = _hash01(ix + 1, iz, seed)
    n01 = _hash01(ix, iz + 1, seed)
    n11 = _hash01(ix + 1, iz + 1, seed)
    return (n00 * (1 - sx) * (1 - sz) + n10 * sx * (1 - sz)
            + n01 * (1 - sx) * sz + n11 * sx * sz)


def _fbm(x: np.ndarray, z: np.ndarray, seed: int, octaves: int = 4) -> np.ndarray:
    total, amp, freq, norm = 0.0, 1.0, 1.0, 0.0
    for o in range(octaves):
        total = total + amp * _value_noise(x * freq, z * freq, seed + o)
        norm += amp
        amp *= 0.5
        freq *= 2.0
    return total / norm


# -- scene definition ---------------------------------------------------------


@dataclass
class _Sphere:
    center: np.ndarray   # (3,)
    radius: float
    base: np.ndarray     # (3,) albedo
    stripe: np.ndarray   # (3,) secondary albedo
    stripe_freq: float
    shiny: float         # specular strength (0 = matte)


def _build_spheres(seed: int) -> List[_Sphere]:
    rng = np.random.RandomState(seed)
    palette = np.array([
        [0.85, 0.30, 0.25], [0.25, 0.55, 0.85], [0.90, 0.75, 0.25],
        [0.35, 0.70, 0.35], [0.75, 0.35, 0.75], [0.90, 0.55, 0.30],
        [0.30, 0.75, 0.70], [0.80, 0.80, 0.80], [0.45, 0.35, 0.75],
        [0.70, 0.50, 0.35], [0.55, 0.65, 0.25], [0.85, 0.45, 0.55],
    ], np.float32)
    spheres = []
    golden = np.pi * (3 - np.sqrt(5.0))
    for i in range(12):
        ang = i * golden
        dist = 0.55 + 1.55 * (i / 11.0)
        r = float(0.12 + 0.22 * rng.rand())
        c = np.array([dist * np.cos(ang), -r, dist * np.sin(ang)], np.float32)
        spheres.append(_Sphere(
            center=c, radius=r,
            base=palette[i],
            stripe=palette[(i + 5) % 12] * 0.6,
            stripe_freq=float(6.0 + 10.0 * rng.rand()),
            shiny=float(rng.rand() > 0.5) * (0.4 + 0.5 * rng.rand()),
        ))
    # one big central sphere
    spheres.append(_Sphere(
        center=np.array([0.0, -0.45, 0.0], np.float32), radius=0.45,
        base=np.array([0.82, 0.72, 0.55], np.float32),
        stripe=np.array([0.35, 0.28, 0.22], np.float32),
        stripe_freq=9.0, shiny=0.6))
    return spheres


# The world is y-DOWN (up = -y), matching COLMAP/3DGS conventions: this is
# what makes proper camera rotations produce upright, non-mirrored images
# under the projection's v-down convention.
_LIGHT = np.array([0.45, -0.80, 0.35], np.float32)
_LIGHT = _LIGHT / np.linalg.norm(_LIGHT)
_GROUND_R = 6.0


def _ground_albedo(px: np.ndarray, pz: np.ndarray, seed: int) -> np.ndarray:
    grass = np.array([0.30, 0.42, 0.22], np.float32)
    dirt = np.array([0.48, 0.40, 0.30], np.float32)
    n = _fbm(px * 1.7, pz * 1.7, seed, octaves=5)[..., None]
    albedo = grass * (1 - n) + dirt * n
    # paved checker path along x
    path = (np.abs(pz) < 0.45)
    checker = ((np.floor(px * 2.2) + np.floor(pz * 2.2)) % 2).astype(np.float32)
    pav = (0.45 + 0.25 * checker)[..., None] * np.ones(3, np.float32)
    albedo = np.where(path[..., None], pav, albedo)
    # fine high-frequency detail everywhere (keeps densification honest)
    detail = 0.85 + 0.3 * _value_noise(px * 23.0, pz * 23.0, seed + 91)[..., None]
    return albedo * detail


def _sky(d: np.ndarray, seed: int) -> np.ndarray:
    t = np.clip(-d[..., 1], 0.0, 1.0)[..., None]
    horizon = np.array([0.85, 0.88, 0.95], np.float32)
    zenith = np.array([0.35, 0.55, 0.90], np.float32)
    base = horizon * (1 - t) + zenith * t
    # clouds from direction noise
    dn = _fbm(d[..., 0] * 6 + 9, d[..., 2] * 6 + 3, seed + 17, octaves=4)
    cloud = np.clip(dn - 0.55, 0, 1)[..., None] * 2.2
    return np.clip(base + cloud * np.array([0.9, 0.9, 0.9], np.float32), 0, 1)


def _intersect_spheres(o, d, spheres, skip_t=None):
    """Nearest sphere hit. Returns (t, hit_id); t=inf on miss."""
    t_min = np.full(o.shape[:-1], np.inf, np.float32)
    hit = np.full(o.shape[:-1], -1, np.int32)
    for i, s in enumerate(spheres):
        oc = o - s.center
        b = (d * oc).sum(-1)
        c2 = (oc * oc).sum(-1) - s.radius * s.radius
        disc = b * b - c2
        ok = disc > 0
        sq = np.sqrt(np.where(ok, disc, 0))
        t = -b - sq
        valid = ok & (t > 1e-3) & (t < t_min)
        t_min = np.where(valid, t, t_min)
        hit = np.where(valid, i, hit)
    return t_min, hit


def _shadow(p, spheres):
    sh = np.ones(p.shape[:-1], np.float32)
    for s in spheres:
        oc = p - s.center
        b = (_LIGHT * oc).sum(-1)
        c2 = (oc * oc).sum(-1) - s.radius * s.radius
        disc = b * b - c2
        t = -b - np.sqrt(np.where(disc > 0, disc, 0))
        sh = np.where((disc > 0) & (t > 1e-3), 0.18, sh)
    return sh


def _trace(o: np.ndarray, d: np.ndarray, spheres, seed: int) -> np.ndarray:
    """Shade primary rays (linear color)."""
    ts, hit = _intersect_spheres(o, d, spheres)
    # ground plane y=0 within a disc (rays heading down = +y)
    tg = np.where(d[..., 1] > 1e-6, -o[..., 1] / d[..., 1], np.inf)
    pg = o + tg[..., None] * d
    on_disc = (pg[..., 0] ** 2 + pg[..., 2] ** 2) < _GROUND_R ** 2
    tg = np.where(on_disc, tg, np.inf).astype(np.float32)

    ground_first = tg < ts
    color = _sky(d, seed)

    # ground shading
    g_mask = ground_first & np.isfinite(tg)
    if g_mask.any():
        p = pg[g_mask]
        albedo = _ground_albedo(p[:, 0], p[:, 2], seed)
        diff = max(float(-_LIGHT[1]), 0.0)   # ground normal is (0,-1,0)
        sh = _shadow(p + np.array([0, -1e-3, 0], np.float32), spheres)
        shade = albedo * (0.25 + 0.85 * diff * sh[..., None])
        # distance fade to sky (aerial perspective)
        fade = np.clip(tg[g_mask] / 40.0, 0, 0.5)[..., None]
        color[g_mask] = shade * (1 - fade) + color[g_mask] * fade

    # sphere shading
    s_mask = (~ground_first) & (hit >= 0)
    if s_mask.any():
        idx = hit[s_mask]
        t = ts[s_mask][..., None]
        p = o[s_mask] + t * d[s_mask]
        out = np.zeros_like(p)
        for i, s in enumerate(spheres):
            m = idx == i
            if not m.any():
                continue
            pi = p[m]
            n = (pi - s.center) / s.radius
            stripe = 0.5 + 0.5 * np.sin(s.stripe_freq * (pi[:, 1] - s.center[1])
                                        / s.radius * 2.0
                                        + 3.0 * np.arctan2(n[:, 2], n[:, 0]))
            albedo = (s.base * stripe[:, None]
                      + s.stripe * (1 - stripe[:, None]))
            diff = np.clip((n * _LIGHT).sum(-1), 0, 1)[:, None]
            sh = _shadow(pi + 1e-3 * n, spheres)[:, None]
            view = -d[s_mask][m]
            h = view + _LIGHT
            h = h / np.maximum(np.linalg.norm(h, axis=-1, keepdims=True), 1e-9)
            spec = s.shiny * np.clip((n * h).sum(-1), 0, 1)[:, None] ** 48
            out[m] = albedo * (0.22 + 0.9 * diff * sh) + spec * sh
        color[s_mask] = out
    return color


# -- cameras ------------------------------------------------------------------


def _look_at(eye: np.ndarray, target: np.ndarray) -> np.ndarray:
    """World->camera pose, OpenCV-style (+x right, +y down, +z forward).
    The world is y-down, so this is a proper rotation (det +1) AND images
    come out upright and non-mirrored."""
    fwd = target - eye
    fwd = fwd / np.linalg.norm(fwd)
    world_down = np.array([0.0, 1.0, 0.0], np.float32)
    right = np.cross(world_down, fwd)
    right /= np.linalg.norm(right)
    down = np.cross(fwd, right)
    R_cw = np.stack([right, down, fwd], axis=0)
    m = np.eye(4, dtype=np.float32)
    m[:3, :3] = R_cw
    m[:3, 3] = -R_cw @ eye
    return m


def _small_rotation(rng, sigma_rad: float) -> np.ndarray:
    w = rng.randn(3) * sigma_rad
    th = np.linalg.norm(w)
    if th < 1e-12:
        return np.eye(3, dtype=np.float32)
    k = w / th
    K = np.array([[0, -k[2], k[1]], [k[2], 0, -k[0]], [-k[1], k[0], 0]])
    return (np.eye(3) + np.sin(th) * K + (1 - np.cos(th)) * K @ K
            ).astype(np.float32)


class ProceduralDataset(ds.Dataset):
    """Garden-class procedural capture: two orbit rings of cameras around the
    courtyard scene, ray-traced ground truth, SfM-style sparse cloud."""

    def __init__(self, num_images: int = 64, image_size=(768, 512),
                 seed: int = 0, split_every: int = 8, fov_deg: float = 60.0,
                 supersample: int = 2, cloud_points: int = 60_000,
                 appearance_jitter: float = 0.0, pose_noise: float = 0.0,
                 verbose: bool = False):
        self._image_size = tuple(image_size)
        self.seed = seed
        self.spheres = _build_spheres(seed)
        self.supersample = supersample
        self.appearance_jitter = appearance_jitter
        w, h = self._image_size

        rng = np.random.RandomState(seed + 1)
        # two rings + a few high shots, all aimed near the scene center
        eyes, targets = [], []
        n_ring1 = int(num_images * 0.55)
        n_ring2 = int(num_images * 0.35)
        n_high = num_images - n_ring1 - n_ring2
        for i in range(n_ring1):
            a = 2 * np.pi * i / n_ring1
            r = 3.4 + 0.25 * rng.randn()
            eyes.append([r * np.cos(a), -1.1 - 0.15 * rng.randn(), r * np.sin(a)])
            targets.append([0.3 * rng.randn(), -0.35, 0.3 * rng.randn()])
        for i in range(n_ring2):
            a = 2 * np.pi * (i + 0.5) / max(n_ring2, 1)
            r = 2.3 + 0.2 * rng.randn()
            eyes.append([r * np.cos(a), -0.75 - 0.1 * rng.randn(), r * np.sin(a)])
            targets.append([0.25 * rng.randn(), -0.3, 0.25 * rng.randn()])
        for i in range(n_high):
            a = 2 * np.pi * (i + 0.25) / max(n_high, 1)
            eyes.append([2.6 * np.cos(a), -2.3, 2.6 * np.sin(a)])
            targets.append([0.0, -0.2, 0.0])
        eyes = np.asarray(eyes, np.float32)
        targets = np.asarray(targets, np.float32)

        true_poses = np.stack([_look_at(e, t) for e, t in zip(eyes, targets)])
        fx = 0.5 * w / np.tan(np.radians(fov_deg) / 2)
        intr = np.tile(np.array([fx, fx, w / 2, h / 2], np.float32)[None],
                       (num_images, 1))

        # images are rendered from TRUE poses; the camera table may be
        # perturbed (pose-refinement experiments recover the difference)
        table_poses = true_poses.copy()
        if pose_noise > 0:
            prng = np.random.RandomState(seed + 7)
            for i in range(num_images):
                dR = _small_rotation(prng, pose_noise)
                dt = prng.randn(3).astype(np.float32) * pose_noise * 2.0
                table_poses[i, :3, :3] = dR @ table_poses[i, :3, :3]
                table_poses[i, :3, 3] += dt
        self.true_poses = true_poses
        self._intr = intr  # host copy (camera table arrays live on device)

        train_idx, val_idx = ds.split_train_val(num_images, split_every)
        labels = np.where(np.isin(np.arange(num_images), val_idx),
                          Label.Validation.value, Label.Training.value)
        self._camera_table = MultiCameraTable(
            camera_t_world=table_poses, intrinsics=intr,
            camera_idx=np.zeros(num_images, int), labels=labels,
            image_size=self._image_size, depth_range=(0.05, 60.0),
            image_names=[f"proc_{i:03d}.png" for i in range(num_images)])
        self._train_idx, self._val_idx = train_idx, val_idx

        jrng = np.random.RandomState(seed + 13)
        self._exposure = np.exp(jrng.randn(num_images, 1, 1, 1).astype(np.float32)
                                * appearance_jitter)
        self._wb = np.exp(jrng.randn(num_images, 1, 1, 3).astype(np.float32)
                          * appearance_jitter * 0.5)

        self._images: List[Optional[np.ndarray]] = [None] * num_images
        self._cloud_points = cloud_points
        self._verbose = verbose

    # -- rendering -------------------------------------------------------

    def _render_image(self, i: int) -> np.ndarray:
        w, h = self._image_size
        ss = self.supersample
        W, H = w * ss, h * ss
        T = self.true_poses[i]
        R_wc = T[:3, :3].T            # camera -> world
        eye = -R_wc @ T[:3, 3]
        fx, fy, cx, cy = self._intr[i] * ss

        img = np.empty((H, W, 3), np.float32)
        rows_per_chunk = max(1, (1 << 22) // W)
        for y0 in range(0, H, rows_per_chunk):
            y1 = min(H, y0 + rows_per_chunk)
            ys, xs = np.mgrid[y0:y1, 0:W].astype(np.float32)
            dirs_cam = np.stack([(xs + 0.5 - cx) / fx,
                                 (ys + 0.5 - cy) / fy,
                                 np.ones_like(xs)], axis=-1)
            d = dirs_cam @ R_wc.T
            d /= np.linalg.norm(d, axis=-1, keepdims=True)
            o = np.broadcast_to(eye, d.shape).astype(np.float32)
            img[y0:y1] = _trace(o.reshape(-1, 3), d.reshape(-1, 3),
                                self.spheres, self.seed).reshape(y1 - y0, W, 3)

        img = img.reshape(h, ss, w, ss, 3).mean(axis=(1, 3))
        img = img * self._exposure[i, 0] * self._wb[i, 0]
        img = np.clip(img, 0.0, 1.0) ** (1 / 2.2)
        return (img * 255).astype(np.uint8)

    def _cache_path(self, i: int):
        import hashlib
        import os
        w, h = self._image_size
        key = (f"{self.seed}-{len(self._images)}-{w}x{h}-{self.supersample}-"
               f"{self.appearance_jitter}")
        tag = hashlib.sha1(key.encode()).hexdigest()[:12]
        d = os.environ.get("PROC_DATASET_CACHE", "/tmp/proc_dataset_cache")
        os.makedirs(d, exist_ok=True)
        return f"{d}/{tag}_{i:03d}.npy"

    def _image(self, i: int) -> np.ndarray:
        if self._images[i] is None:
            import os
            path = self._cache_path(i)
            if os.path.exists(path):
                self._images[i] = np.load(path)
            else:
                if self._verbose:
                    print(f"[procedural] rendering view {i}")
                self._images[i] = self._render_image(i)
                np.save(path, self._images[i])
        return self._images[i]

    def load_images(self):
        for i in range(len(self._images)):
            self._image(i)

    # -- Dataset interface -------------------------------------------------

    def loader(self, idx: Sequence[int]) -> List[ds.ImageView]:
        return [ds.ImageView(filename=f"proc_{i:03d}.png", image_idx=int(i),
                             image=self._image(int(i)))
                for i in np.atleast_1d(idx)]

    def train(self, shuffle: bool = False) -> List[ds.ImageView]:
        idx = (np.random.permutation(self._train_idx) if shuffle
               else self._train_idx)
        return self.loader(idx)

    def val(self) -> List[ds.ImageView]:
        return self.loader(self._val_idx)

    @property
    def camera_table(self) -> CameraTable:
        return self._camera_table

    def pointcloud(self) -> Optional[PointCloud]:
        """SfM-style sparse cloud: noisy samples of the visible surfaces."""
        rng = np.random.RandomState(self.seed + 3)
        n = self._cloud_points
        n_ground = n // 2
        # ground disc samples, density biased to the center
        rr = _GROUND_R * 0.7 * np.sqrt(rng.rand(n_ground)) ** 1.3
        aa = 2 * np.pi * rng.rand(n_ground)
        gx, gz = rr * np.cos(aa), rr * np.sin(aa)
        gp = np.stack([gx, np.zeros_like(gx), gz], -1)
        gc = _ground_albedo(gx, gz, self.seed)

        areas = np.array([s.radius ** 2 for s in self.spheres])
        counts = np.maximum((areas / areas.sum() * (n - n_ground)).astype(int), 1)
        sp, sc = [], []
        for s, c in zip(self.spheres, counts):
            d = rng.randn(c, 3)
            d /= np.linalg.norm(d, axis=-1, keepdims=True)
            p = s.center + d * s.radius
            sp.append(p)
            sc.append(np.tile(s.base, (c, 1)))
        pts = np.concatenate([gp] + sp).astype(np.float32)
        cols = np.concatenate([gc] + sc).astype(np.float32)
        pts = pts + rng.randn(*pts.shape).astype(np.float32) * 0.008
        return PointCloud(points=pts, colors=np.clip(cols, 0, 1))
