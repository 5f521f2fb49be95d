"""View-overlap clustering: point k-means + per-view cluster-visibility.

Capability equivalent of /root/reference/splat_trainer/visibility/
cluster.py:14-135 (PointClusters, ViewClustering) and its batch-selection
helpers (:186-309), with pykeops replaced by ops/knn.py.
"""

from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from splat_trainer_tpu.ops.knn import assign_clusters, kmeans


def normalize(x, axis, eps=1e-12):
    return x / jnp.maximum(jnp.linalg.norm(x, axis=axis, keepdims=True), eps)


@dataclass
class PointClusters:
    """k-means clustering of point positions (cluster.py:14-62)."""
    point_labels: jnp.ndarray  # (N,) int32
    centroids: jnp.ndarray     # (K, 3)

    @staticmethod
    def cluster(positions, num_clusters: int, active=None,
                key=None, iters: int = 100) -> "PointClusters":
        k = min(num_clusters, positions.shape[0])
        labels, centroids = kmeans(positions, k, iters=iters, key=key, mask=active)
        return PointClusters(point_labels=labels, centroids=centroids)

    @property
    def num_clusters(self) -> int:
        return self.centroids.shape[0]

    def assign_clusters(self, points):
        return assign_clusters(points, self.centroids)

    def view_features(self, point_vis: jnp.ndarray,
                      vis_threshold: float = 0.01) -> jnp.ndarray:
        """Cluster-wise visibility sums for one view — capacity-masked
        version of cluster.py:34-47 (mask instead of sparse idx)."""
        vis = jnp.where(point_vis > vis_threshold, point_vis, 0.0)
        return jax.ops.segment_sum(vis, self.point_labels,
                                   num_segments=self.num_clusters)

    def state_dict(self):
        return {"point_labels": np.asarray(self.point_labels),
                "centroids": np.asarray(self.centroids)}

    @classmethod
    def from_state_dict(cls, state):
        return cls(point_labels=jnp.asarray(state["point_labels"]),
                   centroids=jnp.asarray(state["centroids"]))


class ViewClustering:
    """View x cluster visibility matrix + view-similarity queries
    (cluster.py:65-135)."""

    def __init__(self, point_clusters: PointClusters,
                 cluster_visibility: jnp.ndarray, metric: str = "cosine"):
        assert metric in ("cosine", "euclidean")
        self.point_clusters = point_clusters
        self.cluster_visibility = cluster_visibility  # (views, K)
        self.metric = metric
        self._normalized = None
        self._similarity = None

    @property
    def normalized_visibility(self) -> jnp.ndarray:
        if self._normalized is None:
            v = normalize(self.cluster_visibility, axis=0)  # per cluster
            self._normalized = normalize(v, axis=1)         # per view
        return self._normalized

    @property
    def view_similarity(self) -> jnp.ndarray:
        if self._similarity is None:
            self._similarity = self.overlaps_with(self.normalized_visibility)
        return self._similarity

    def overlaps_with(self, vec: jnp.ndarray) -> jnp.ndarray:
        nv = self.normalized_visibility
        if self.metric == "cosine":
            return vec @ nv.T
        d = ((vec[:, None] - nv[None]) ** 2).sum(-1)
        return jnp.sqrt(jnp.maximum(d, 0.0))

    def sample_batch(self, rng: np.random.RandomState, weighting: np.ndarray,
                     batch_size: int, temperature: float = 1.0) -> np.ndarray:
        return sample_batch(rng, np.asarray(self.view_similarity),
                            weighting, batch_size, temperature)

    def visible_points(self, batch_indices) -> jnp.ndarray:
        """Mask of points in clusters visible from the batch views
        (cluster.py:116-120)."""
        cvis = self.cluster_visibility[jnp.asarray(batch_indices)].sum(0)
        return cvis[self.point_clusters.point_labels] > 0

    def state_dict(self):
        return {"point_clusters": self.point_clusters.state_dict(),
                "cluster_visibility": np.asarray(self.cluster_visibility),
                "metric": self.metric}

    @classmethod
    def from_state_dict(cls, state):
        return cls(PointClusters.from_state_dict(state["point_clusters"]),
                   jnp.asarray(state["cluster_visibility"]), state["metric"])


# -- host-side sampling helpers (numpy; reference cluster.py:186-309) -------


def sample_with_temperature(rng: np.random.RandomState, p: np.ndarray,
                            temperature: float = 1.0, n: int = 1,
                            weighting: Optional[np.ndarray] = None) -> np.ndarray:
    if temperature == 0:
        q = p * weighting if weighting is not None else p
        return np.argsort(-q)[:n]
    logits = np.log(np.maximum(p, 1e-12)) / temperature
    q = np.exp(logits - logits.max())
    if weighting is not None:
        q = q * weighting
    q = q / q.sum()
    return rng.choice(len(p), size=n, replace=False, p=q)


def sample_batch(rng: np.random.RandomState, view_similarity: np.ndarray,
                 weighting: np.ndarray, batch_size: int,
                 temperature: float = 1.0) -> np.ndarray:
    """Master view by weighting, others by overlap similarity
    (cluster.py:226-241)."""
    w = weighting / max(weighting.sum(), 1e-12)
    index = rng.choice(len(w), p=w)
    if batch_size <= 1:
        return np.array([index])
    probs = view_similarity[index].copy()
    probs[index] = 0
    others = sample_with_temperature(rng, np.maximum(probs, 0) + 1e-9,
                                     temperature, batch_size - 1, weighting)
    return np.concatenate([[index], others])


def sinkhorn(matrix: np.ndarray, num_iter: int, epsilon: float = 1e-8) -> np.ndarray:
    """Sinkhorn-Knopp double normalization (cluster.py:288-309)."""
    m = matrix.copy()
    for _ in range(num_iter):
        m = (m + m.T) / 2
        m = m / (m.sum(axis=1, keepdims=True) + epsilon)
        m = m / (m.sum(axis=0, keepdims=True) + epsilon)
    return m
