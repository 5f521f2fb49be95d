"""Tests for SH basis, SSIM, kNN/k-means, misc utilities."""

import jax
import jax.numpy as jnp
import numpy as np

from splat_trainer_tpu.ops import knn, sh, ssim
from splat_trainer_tpu.utils import misc


def random_dirs(key, n):
    d = jax.random.normal(key, (n, 3))
    return d / jnp.linalg.norm(d, axis=-1, keepdims=True)


def test_sh_orthonormality():
    """Monte-Carlo check: int y_i y_j dOmega = delta_ij."""
    key = jax.random.PRNGKey(0)
    d = random_dirs(key, 200_000)
    basis = sh.sh_basis(d, degree=3)                 # (N, 16)
    gram = (basis.T @ basis) * (4 * np.pi / d.shape[0])
    np.testing.assert_allclose(gram, np.eye(16), atol=0.05)


def test_sh_known_values():
    d = jnp.array([[0.0, 0.0, 1.0]])
    b = np.asarray(sh.sh_basis(d, degree=1))[0]
    np.testing.assert_allclose(b[0], 0.2820948, rtol=1e-5)   # Y00
    np.testing.assert_allclose(b[2], 0.4886025, rtol=1e-5)   # Y10 ~ z
    np.testing.assert_allclose(b[1], 0.0, atol=1e-7)
    np.testing.assert_allclose(b[3], 0.0, atol=1e-7)


def test_evaluate_sh_dc():
    feat = jnp.zeros((4, 3, 9)).at[:, :, 0].set(1.0)
    dirs = random_dirs(jax.random.PRNGKey(1), 4)
    out = sh.evaluate_sh(feat, dirs, degree=2)
    np.testing.assert_allclose(out, sh.SH_C0, rtol=1e-5)


def test_ssim_matches_naive_oracle():
    """The banded-matmul formulation must equal a direct sliding-window
    SSIM (valid padding) and the matmul 2x2 pool must equal reshape-mean."""
    key = jax.random.PRNGKey(4)
    k1, k2 = jax.random.split(key)
    a = jax.random.uniform(k1, (25, 31, 3))
    b = jnp.clip(a + jax.random.normal(k2, a.shape) * 0.1, 0, 1)

    # naive valid-padding gaussian blur oracle
    kern = np.asarray(ssim._gaussian_kernel(11))
    win = np.outer(kern, kern)

    def blur_naive(x):
        x = np.asarray(x)
        h, w, c = x.shape
        out = np.zeros((h - 10, w - 10, c))
        for i in range(h - 10):
            for j in range(w - 10):
                out[i, j] = np.tensordot(win, x[i:i + 11, j:j + 11], 2)
        return out

    mu_a, mu_b = blur_naive(a), blur_naive(b)
    sa = blur_naive(np.asarray(a) ** 2) - mu_a ** 2
    sb = blur_naive(np.asarray(b) ** 2) - mu_b ** 2
    sab = blur_naive(np.asarray(a) * np.asarray(b)) - mu_a * mu_b
    c1, c2 = 0.01 ** 2, 0.03 ** 2
    expected = (((2 * mu_a * mu_b + c1) * (2 * sab + c2))
                / ((mu_a ** 2 + mu_b ** 2 + c1) * (sa + sb + c2))).mean()
    np.testing.assert_allclose(float(ssim.ssim(a, b)), expected, atol=1e-5)

    # matmul pool == reshape-mean pool (odd tails cropped)
    xc = a.transpose(2, 0, 1)
    pooled = ssim._avg_pool2(xc, jax.lax.Precision.HIGHEST)
    ref = np.asarray(a)[:24, :30].reshape(12, 2, 15, 2, 3).mean((1, 3))
    np.testing.assert_allclose(np.asarray(pooled).transpose(1, 2, 0), ref,
                               atol=1e-6)


def test_ssim_basic():
    key = jax.random.PRNGKey(0)
    img = jax.random.uniform(key, (48, 48, 3))
    assert float(ssim.ssim(img, img)) > 0.999
    noisy = jnp.clip(img + jax.random.normal(key, img.shape) * 0.5, 0, 1)
    s = float(ssim.ssim(img, noisy))
    assert 0.0 < s < 0.95
    loss, metric = ssim.multiscale_ssim_loss(img, noisy, levels=3)
    assert 0.0 < float(loss) < 1.0
    np.testing.assert_allclose(metric, s, atol=1e-6)


def test_kmeans_separated_clusters():
    key = jax.random.PRNGKey(0)
    centers = jnp.array([[0.0, 0, 0], [10.0, 0, 0], [0, 10.0, 0]])
    pts = (centers[jnp.arange(300) % 3]
           + jax.random.normal(key, (300, 3)) * 0.1)
    labels, found = knn.kmeans(pts, 3, iters=10)
    # all points of one true cluster share a label
    l = np.asarray(labels)
    for i in range(3):
        assert len(set(l[i::3])) == 1
    # centroids near the truth
    d = np.linalg.norm(np.asarray(found)[:, None] - np.asarray(centers)[None],
                       axis=-1).min(axis=0)
    assert (d < 0.5).all()


def test_knn_distances():
    # unit grid: nearest neighbor distance = 1
    xs = jnp.arange(5, dtype=jnp.float32)
    pts = jnp.stack(jnp.meshgrid(xs, xs, xs), -1).reshape(-1, 3)
    d = knn.knn_distances(pts, k=1, block=64)
    np.testing.assert_allclose(d, 1.0, atol=1e-5)


def test_misc_functions():
    assert misc.next_multiple(100, 256) == 256
    np.testing.assert_allclose(
        float(misc.exp_lerp(1.0, jnp.float32(0.0), jnp.float32(5.0))), 5.0,
        rtol=1e-6)
    assert float(misc.soft_gt(jnp.float32(10.0), 1.0)) > 0.99
    assert float(misc.soft_lt(jnp.float32(10.0), 1.0)) < 0.01
    assert 0.0 < float(misc.saturate(jnp.float32(0.2))) < 1.0

    h = misc.Heap(2)
    for v, item in [(3, "c"), (1, "a"), (2, "b")]:
        h.push(v, item)
    assert [item for _v, item in h] == ["b", "c"]


def test_straight_through():
    from splat_trainer_tpu.utils.straight_through import clamp_st, round_st
    x = jnp.array([1.7, -0.3])
    np.testing.assert_allclose(clamp_st(x), [1.0, 0.0])
    g = jax.grad(lambda x: clamp_st(x).sum())(x)
    np.testing.assert_allclose(g, 1.0)  # identity gradient
    np.testing.assert_allclose(round_st(x), [2.0, -0.0])


def test_segment_sum_contiguous_matches_segment_sum():
    from splat_trainer_tpu.ops.segmented import segment_sum_contiguous
    key = jax.random.PRNGKey(0)
    m, n, r = 4096, 37, 5
    # random contiguous partition of [0, m) into n segments (some empty)
    cuts = np.sort(np.asarray(
        jax.random.randint(jax.random.fold_in(key, 1), (n - 1,), 0, m)))
    starts = jnp.asarray(np.concatenate([[0], cuts]), jnp.int32)
    ends = jnp.asarray(np.concatenate([cuts, [m]]), jnp.int32)
    v = jax.random.normal(jax.random.fold_in(key, 2), (m, r))

    got = segment_sum_contiguous(v, starts, ends)
    sid = np.repeat(np.arange(n), np.asarray(ends - starts))
    want = jax.ops.segment_sum(v, jnp.asarray(sid), num_segments=n)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=1e-5)


def test_segment_sum_contiguous_precision_under_large_prefix():
    """Small positive segments must survive a huge all-positive prefix (the
    visibility reduction case: totals ~1e6, segments ~1e-2)."""
    from splat_trainer_tpu.ops.segmented import segment_sum_contiguous
    m = 1 << 16
    v = jnp.full((m, 1), 37.123, jnp.float32)
    # one tiny segment deep into the array
    s, e = m - 700, m - 700 + 3
    v = v.at[s:e, 0].set(1.25e-3)
    out = segment_sum_contiguous(
        v, jnp.asarray([s], jnp.int32), jnp.asarray([e], jnp.int32))
    np.testing.assert_allclose(out[0, 0], 3 * 1.25e-3, rtol=1e-4)
