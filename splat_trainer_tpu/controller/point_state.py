"""Per-point densification statistics, accumulated every train step.

Capability equivalent of the reference PointState
(/root/reference/splat_trainer/controller/point_state.py:11-57), capacity-
shaped: EMA-merged prune/split heuristics (log-space lerp), running max
screen scale, in-view counts and visibility sums. The heuristics arrive
from the renderer's backward pass via the heur_sink gradient tap
(ops/renderer.py).
"""

import jax
import jax.numpy as jnp
from flax import struct

from splat_trainer_tpu.utils.misc import exp_lerp


@struct.dataclass
class PointState:
    prune_cost: jax.Array      # (C,)
    split_score: jax.Array     # (C,)
    max_scale_px: jax.Array    # (C,) max screen-space sigma seen (pixels)
    points_in_view: jax.Array  # (C,) int32
    visibility: jax.Array      # (C,) accumulated visibility

    @staticmethod
    def new_zeros(capacity: int) -> "PointState":
        z = lambda: jnp.zeros((capacity,), jnp.float32)
        return PointState(
            prune_cost=z(), split_score=z(), max_scale_px=z(),
            points_in_view=jnp.zeros((capacity,), jnp.int32), visibility=z())

    def add_rendering(
        self,
        in_view: jax.Array,        # (C,) bool — projected into this view
        visibility: jax.Array,     # (C,) compositing-weight sums
        screen_scale: jax.Array,   # (C, 2)
        split_score: jax.Array,    # (C,) this-step heuristic (from grad tap)
        prune_cost: jax.Array,     # (C,)
        split_alpha: float = 0.01,
        prune_alpha: float = 0.1,
    ) -> "PointState":
        """Merge one render's statistics (reference point_state.py:34-50)."""
        scale_px = screen_scale.max(axis=-1)
        rendered = visibility > 0.0
        return PointState(
            max_scale_px=jnp.where(
                in_view, jnp.maximum(self.max_scale_px, scale_px),
                self.max_scale_px),
            points_in_view=self.points_in_view + rendered.astype(jnp.int32),
            visibility=self.visibility + jnp.where(in_view, visibility, 0.0),
            split_score=jnp.where(
                in_view, exp_lerp(split_alpha, self.split_score, split_score),
                self.split_score),
            prune_cost=jnp.where(
                in_view, exp_lerp(prune_alpha, self.prune_cost, prune_cost),
                self.prune_cost),
        )

    def masked_heuristics(self, min_views: int, active: jax.Array):
        """Gate heuristics on view counts (reference point_state.py:52-57):
        under-observed or inactive points can't be pruned (inf cost) and
        won't be split (0 score)."""
        seen = (self.points_in_view >= min_views) & active
        prune_cost = jnp.where(seen, self.prune_cost, jnp.inf)
        split_score = jnp.where(seen, self.split_score, 0.0)
        return prune_cost, split_score

    def reset_slots(self, mask: jax.Array) -> "PointState":
        """Zero statistics at refreshed capacity slots (densify rebuild)."""
        w = lambda x: jnp.where(mask, jnp.zeros_like(x), x)
        return PointState(
            prune_cost=w(self.prune_cost), split_score=w(self.split_score),
            max_scale_px=w(self.max_scale_px),
            points_in_view=jnp.where(mask, 0, self.points_in_view),
            visibility=w(self.visibility))


def take_n_mask(values: jax.Array, n: jax.Array, descending: bool = False) -> jax.Array:
    """Boolean mask of the n largest/smallest entries, with *traced* n
    (reference take_n, target_controller.py:150-160 — argsort + rank test
    instead of top_k because n varies per densify step)."""
    order = jnp.argsort(jnp.where(descending, -values, values))
    rank = jnp.zeros_like(order).at[order].set(jnp.arange(values.shape[0]))
    return rank < n
