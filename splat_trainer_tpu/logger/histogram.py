"""Device-side fixed-range histogram, mergeable.

Capability equivalent of /root/reference/splat_trainer/logger/
histogram.py:7-110: binned counts + sum/sum-of-squares so histograms can be
computed on device, merged across steps, and logged as pre-binned data.
"""

from dataclasses import dataclass

import numpy as np


@dataclass
class Histogram:
    counts: np.ndarray      # (bins,)
    bin_edges: np.ndarray   # (bins + 1,)
    total: float
    total_sq: float
    n: int

    @staticmethod
    def from_values(values, bins: int = 64, range=None) -> "Histogram":
        values = np.asarray(values).reshape(-1)
        values = values[np.isfinite(values)]
        if values.size == 0:
            edges = np.linspace(0, 1, bins + 1)
            return Histogram(np.zeros(bins), edges, 0.0, 0.0, 0)
        counts, edges = np.histogram(values, bins=bins, range=range)
        return Histogram(counts.astype(np.float64), edges,
                         float(values.sum()), float((values ** 2).sum()),
                         int(values.size))

    def __add__(self, other: "Histogram") -> "Histogram":
        if self.n == 0:
            return other
        if other.n == 0:
            return self
        assert np.allclose(self.bin_edges, other.bin_edges), \
            "histograms must share bin edges to merge"
        return Histogram(self.counts + other.counts, self.bin_edges,
                         self.total + other.total,
                         self.total_sq + other.total_sq, self.n + other.n)

    @property
    def mean(self) -> float:
        return self.total / max(self.n, 1)

    @property
    def std(self) -> float:
        m = self.mean
        return float(np.sqrt(max(self.total_sq / max(self.n, 1) - m * m, 0.0)))
