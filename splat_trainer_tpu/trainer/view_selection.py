"""View selection strategies: which images form the next gradient batch.

Capability equivalent of /root/reference/splat_trainer/trainer/
view_selection.py:13-175: RandomSampler (epoch shuffling),
BatchOverlapSampler (overlap-similarity sampling with inverse-use-count
weighting), TargetOverlap (views whose overlap with a history buffer is
closest to a target). Host-side numpy; overlaps come from the
ViewClustering built at evaluation time.
"""

from abc import ABC, abstractmethod
from dataclasses import dataclass
from typing import Optional

import numpy as np

from splat_trainer_tpu.config import Progress, VaryingInt, eval_varying
from splat_trainer_tpu.visibility.cluster import ViewClustering, sample_with_temperature


class ViewSelection(ABC):
    @abstractmethod
    def select_images(self, view_clustering: Optional[ViewClustering],
                      progress: Progress) -> np.ndarray:
        ...

    @abstractmethod
    def state_dict(self) -> dict:
        ...

    @abstractmethod
    def load_state_dict(self, state: dict):
        ...


@dataclass(frozen=True)
class RandomSamplerConfig:
    batch_size: VaryingInt = 1

    def create(self, train_idx: np.ndarray, seed: int = 0) -> "RandomSampler":
        return RandomSampler(self, train_idx, seed)


class RandomSampler(ViewSelection):
    """Epoch-shuffled random sampling (view_selection.py:93-115)."""

    def __init__(self, config: RandomSamplerConfig, train_idx: np.ndarray,
                 seed: int = 0):
        self.config = config
        self.train_idx = np.asarray(train_idx)
        self.rng = np.random.RandomState(seed)
        self.next = self.rng.permutation(self.train_idx)

    def select_images(self, view_clustering, progress) -> np.ndarray:
        batch_size = int(eval_varying(self.config.batch_size, progress))
        # top up with fresh epochs so batches are always exactly batch_size —
        # ragged tail batches would retrigger jit compilation (and break the
        # camera-sharded dp batch layout)
        while self.next.shape[0] < batch_size:
            self.next = np.concatenate(
                [self.next, self.rng.permutation(self.train_idx)])
        batch, self.next = self.next[:batch_size], self.next[batch_size:]
        return batch

    def state_dict(self):
        return dict(next=self.next.copy())

    def load_state_dict(self, state):
        self.next = np.asarray(state["next"])


@dataclass(frozen=True)
class BatchOverlapSamplerConfig:
    batch_size: VaryingInt = 1
    overlap_temperature: float = 0.5

    def create(self, train_idx: np.ndarray, seed: int = 0) -> "BatchOverlapSampler":
        return BatchOverlapSampler(self, train_idx, seed)


class BatchOverlapSampler(ViewSelection):
    """Sample batches of mutually-overlapping views, weighted to less-used
    views (view_selection.py:46-79)."""

    def __init__(self, config, train_idx: np.ndarray, seed: int = 0):
        self.config = config
        self.train_idx = np.asarray(train_idx)
        self.rng = np.random.RandomState(seed)
        self.view_counts = np.zeros(len(train_idx))
        self.used_mask = np.zeros(len(train_idx), bool)

    def select_images(self, view_clustering, progress) -> np.ndarray:
        batch_size = int(eval_varying(self.config.batch_size, progress))
        if view_clustering is None:
            return self.rng.choice(self.train_idx, batch_size, replace=False)

        if self.used_mask.all():
            self.used_mask[:] = False

        weighting = 1.0 / (self.view_counts + 1)
        weighting[self.used_mask] = 0
        weighting = weighting / weighting.sum()

        local = view_clustering.sample_batch(
            self.rng, weighting, batch_size, self.config.overlap_temperature)
        self.used_mask[local] = True
        self.view_counts[local] += 1
        return self.train_idx[local]

    def state_dict(self):
        return dict(view_counts=self.view_counts.copy(),
                    used_mask=self.used_mask.copy())

    def load_state_dict(self, state):
        self.view_counts = np.asarray(state["view_counts"])
        self.used_mask = np.asarray(state["used_mask"])


@dataclass(frozen=True)
class TargetOverlapConfig:
    batch_size: VaryingInt = 1
    overlap_temperature: float = 0.5
    history_size: int = 4
    target_overlap: float = 0.25

    def create(self, train_idx: np.ndarray, seed: int = 0) -> "TargetOverlap":
        return TargetOverlap(self, train_idx, seed)


class TargetOverlap(ViewSelection):
    """Prefer views whose overlap with the recent history is closest to
    target_overlap (view_selection.py:134-175)."""

    def __init__(self, config, train_idx: np.ndarray, seed: int = 0):
        self.config = config
        self.train_idx = np.asarray(train_idx)
        self.rng = np.random.RandomState(seed)
        self.available = np.ones(len(train_idx), bool)
        self.history = self.rng.permutation(len(train_idx))[:config.history_size]

    def select_images(self, view_clustering, progress) -> np.ndarray:
        batch_size = int(eval_varying(self.config.batch_size, progress))
        if view_clustering is None:
            return self.rng.choice(self.train_idx, batch_size, replace=False)

        if self.available.sum() < batch_size:
            self.available[:] = True

        nv = np.asarray(view_clustering.normalized_visibility)
        hist_vec = nv[self.history].sum(0)
        hist_vec = hist_vec / max(np.linalg.norm(hist_vec), 1e-12)
        overlaps = np.asarray(view_clustering.overlaps_with(hist_vec[None]))[0]

        score = 1.0 - (self.config.target_overlap - overlaps) ** 2
        score = score[self.available]
        idx_avail = np.nonzero(self.available)[0]
        pick = sample_with_temperature(
            self.rng, np.maximum(score, 0) + 1e-6,
            self.config.overlap_temperature, batch_size)
        local = idx_avail[pick]

        self.available[local] = False
        self.history = np.concatenate([local, self.history])[:max(
            self.config.history_size, batch_size)]
        return self.train_idx[local]

    def state_dict(self):
        return dict(available=self.available.copy(), history=self.history.copy())

    def load_state_dict(self, state):
        self.available = np.asarray(state["available"])
        self.history = np.asarray(state["history"])
