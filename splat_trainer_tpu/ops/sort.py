"""Vectorized LSD radix sort built from cumsums + scatters.

Status: measured SLOWER than `jax.lax.sort_key_val` for the binning
pipeline on real TPU and therefore NOT used by ops/tiling.py. The full
chained A/B (train-step ground truth, see git history of tiling.py):
lax.sort on the packed (tile, depth) u32 key ≈ 1.8x faster end-to-end than
tile-bits-only radix passes — XLA's TPU sort is better tuned than its
reputation, and every radix pass pays full-M scatter/cumsum memory traffic
that the fused comparison network avoids. Kept (with tests) as the
building block for possible future uses where keys are very narrow (e.g.
2-4 bit bucket partitions) and a single pass suffices.
"""

import jax
import jax.numpy as jnp


def radix_sort_pass(keys: jax.Array, payload: jax.Array, shift: int,
                    digit_bits: int):
    """One stable counting-sort pass on digit `keys >> shift & mask`.

    The within-digit ranks come from `nd` separate 1-D cumsums — NOT one
    (M, nd) axis-0 cumsum, which XLA lowers catastrophically on TPU
    (measured ~70 ms at M=2M vs ~35 us for the 1-D scan)."""
    nd = 1 << digit_bits
    d = ((keys >> shift) & (nd - 1)).astype(jnp.int32)
    rank = jnp.zeros(keys.shape, jnp.int32)
    counts = []
    for v in range(nd):
        ind = (d == v)
        cum = jnp.cumsum(ind.astype(jnp.int32))         # inclusive, fast path
        counts.append(cum[-1])
        rank = rank + jnp.where(ind, cum - 1, 0)
    counts = jnp.stack(counts)                          # (nd,)
    base = jnp.cumsum(counts) - counts                  # exclusive digit offsets
    pos = base[d] + rank                                # destination permutation
    keys = jnp.zeros_like(keys).at[pos].set(keys)
    payload = jax.tree_util.tree_map(
        lambda p: jnp.zeros_like(p).at[pos].set(p), payload)
    return keys, payload


def radix_sort(keys: jax.Array, payload, num_bits: int,
               digit_bits: int = 4):
    """Stable ascending sort of uint32/int32 `keys` (only the low `num_bits`
    participate) carrying `payload` (array or pytree of (M, ...) arrays)."""
    for shift in range(0, num_bits, digit_bits):
        keys, payload = radix_sort_pass(keys, payload, shift, digit_bits)
    return keys, payload


def radix_argsort(keys: jax.Array, num_bits: int, digit_bits: int = 4):
    """Stable argsort: returns (sorted_keys, order) with keys[order] sorted."""
    order = jnp.arange(keys.shape[0], dtype=jnp.int32)
    return radix_sort(keys, order, num_bits, digit_bits)
