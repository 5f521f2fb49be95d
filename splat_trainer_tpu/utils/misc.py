"""Small math utilities (jnp equivalents of reference util/misc.py:21-68)."""

import heapq

import jax.numpy as jnp


def next_multiple(x: int, multiple: int) -> int:
    return -(-x // multiple) * multiple


def format_dict(d: dict, precision: int = 4, align: str = "<") -> str:
    return " ".join(f"{k}: {v:{align}{precision + 3}.{precision}g}" for k, v in d.items())


def inverse_sigmoid(x):
    return jnp.log(x) - jnp.log1p(-x)


def soft_gt(t, threshold: float, margin: float = 8.0):
    """Soft greater-than threshold via sigmoid centered at `threshold`."""
    return jnp.asarray(1.0) / (1.0 + jnp.exp(-(t - threshold) * margin / threshold))


def soft_lt(t, threshold: float, margin: float = 8.0):
    return 1.0 - soft_gt(t, threshold, margin)


def lerp(t, a, b):
    return a + (b - a) * t


def exp_lerp(t, a, b):
    """Log-space interpolation: smooth-max-like EMA merge used for the
    densification heuristics (reference controller/point_state.py:49-50)."""
    m = jnp.maximum(a, b)
    return m + jnp.log(lerp(t, jnp.exp(a - m), jnp.exp(b - m)))


def pow_lerp(t, a, b, k: float = 2.0):
    return lerp(t, a ** k, b ** k) ** (1.0 / k)


def saturate(t, gain: float = 6.0, k: float = 1.0):
    """Smooth 0->1 saturation used in the opacity regularizer
    (reference compute_reg, mlp_scene.py:257)."""
    return (1.0 - jnp.exp(-gain * t)) ** k


class Heap:
    """Bounded top-k heap (host-side; reference util/misc.py:92-110)."""

    def __init__(self, max_size: int):
        self.max_size = max_size
        self.heap = []
        self._counter = 0

    def push(self, value, item):
        # counter breaks ties so items never get compared
        heapq.heappush(self.heap, (value, self._counter, item))
        self._counter += 1
        if len(self.heap) > self.max_size:
            heapq.heappop(self.heap)

    def __iter__(self):
        return iter((v, item) for v, _c, item in sorted(self.heap))

    def __len__(self):
        return len(self.heap)
