"""Blocked kNN and k-means in pure jnp.

TPU-native replacement for pykeops LazyTensor reductions (SURVEY.md N11;
usage /root/reference/splat_trainer/visibility/cluster.py:139-180 and
gaussians/loading.py:45-61). Pairwise distances are computed in
query-blocks via one MXU matmul per block (|x-c|^2 = |x|^2 - 2 x.c + |c|^2)
with `lax.map` bounding memory — the KeOps-style symbolic reduction becomes
a tiled matmul, which is exactly what the MXU wants.
"""

import functools

import jax
import jax.numpy as jnp


def _block_argmin(xb, c, c_sq):
    d = -2.0 * (xb @ c.T) + c_sq[None]
    d = d + (xb * xb).sum(-1, keepdims=True)
    return jnp.argmin(d, axis=-1).astype(jnp.int32)


def assign_clusters(x: jnp.ndarray, centroids: jnp.ndarray,
                    block: int = 16384) -> jnp.ndarray:
    """Nearest-centroid assignment, (N,) int32 (cluster.py:139-147)."""
    n = x.shape[0]
    pad = -n % block
    xp = jnp.pad(x, ((0, pad), (0, 0)))
    c_sq = (centroids * centroids).sum(-1)
    blocks = xp.reshape(-1, block, x.shape[1])
    out = jax.lax.map(functools.partial(_block_argmin, c=centroids, c_sq=c_sq), blocks)
    return out.reshape(-1)[:n]


def kmeans(x: jnp.ndarray, k: int, iters: int = 100,
           key: jax.Array | None = None, mask: jnp.ndarray | None = None):
    """Lloyd k-means (cluster.py:150-180). Returns (labels, centroids).

    `mask` excludes inactive capacity slots from both assignment statistics
    and initialization.
    """
    n = x.shape[0]
    if key is None:
        key = jax.random.PRNGKey(0)
    if mask is None:
        mask = jnp.ones((n,), bool)

    # init: random active points
    p = mask / jnp.maximum(mask.sum(), 1)
    init_idx = jax.random.choice(key, n, (k,), replace=True, p=p)
    centroids = x[init_idx]

    def body(_i, carry):
        centroids, _labels = carry
        labels = assign_clusters(x, centroids)
        labels = jnp.where(mask, labels, k)  # masked points -> dropped bucket
        sums = jax.ops.segment_sum(
            jnp.where(mask[:, None], x, 0.0), labels, num_segments=k + 1)[:k]
        counts = jax.ops.segment_sum(
            mask.astype(jnp.float32), labels, num_segments=k + 1)[:k]
        new_c = jnp.where(counts[:, None] > 0,
                          sums / jnp.maximum(counts[:, None], 1.0), centroids)
        return new_c, labels

    centroids, labels = jax.lax.fori_loop(
        0, iters, body, (centroids, jnp.zeros((n,), jnp.int32)))
    return labels, centroids


def knn_distances(x: jnp.ndarray, k: int, block: int = 4096,
                  mask: jnp.ndarray | None = None) -> jnp.ndarray:
    """Mean distance to the k nearest neighbors (excluding self), (N,).

    Replaces the pykeops Kmin reduction used for initial-scale estimation
    (reference gaussians/loading.py:45-61).
    """
    n = x.shape[0]
    if mask is None:
        mask = jnp.ones((n,), bool)
    pad = -n % block
    xp = jnp.pad(x, ((0, pad), (0, 0)))
    idxp = jnp.pad(jnp.arange(n), (0, pad), constant_values=-1)

    x_sq = (x * x).sum(-1)
    big = jnp.float32(1e30)

    def block_knn(args):
        xb, ib = args
        d = (xb * xb).sum(-1, keepdims=True) - 2.0 * (xb @ x.T) + x_sq[None]
        # mask self & invalid
        d = jnp.where(jnp.arange(n)[None] == ib[:, None], big, d)
        d = jnp.where(mask[None], d, big)
        neg_topk, _ = jax.lax.top_k(-d, k)
        return jnp.sqrt(jnp.maximum(-neg_topk, 0.0)).mean(-1)

    blocks = (xp.reshape(-1, block, x.shape[1]), idxp.reshape(-1, block))
    out = jax.lax.map(block_knn, blocks)
    return out.reshape(-1)[:n]
