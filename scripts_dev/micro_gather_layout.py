"""Dev: layout experiments for the segmented-reduction boundary gather.

Trace finding (2026-08-19, ts32 garden-scale fallback): the (N, 2R) row
gather of the compensated prefix at segment ends costs ~24 ms/step — the
scan pipeline leaves cex in a dim0-minor layout, so each "row" gather
reads 2R strided elements. Force a row-major materialization and compare.
"""
import sys, time, functools
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
from jax import lax

M, N, R2 = 1245184, 600064, 20

def timeit(name, fn, *args, iters=20):
    out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    import numpy as np
    np.asarray(jnp.sum(out))  # host sync (relay-safe)
    print(f"{name:44s} {(time.perf_counter()-t0)/iters*1e3:8.3f} ms", flush=True)

key = jax.random.PRNGKey(0)
vals = jax.random.normal(key, (M // 512, 512, R2 // 2))
idx = jnp.sort(jax.random.randint(key, (N,), 0, M, dtype=jnp.int32))

def make_cex(v):
    # mimics segmented.py: associative_scan along axis=1, reshape, concat
    hi, lo = lax.associative_scan(
        lambda a, b: (a[0] + b[0], a[1] + b[1]), (v, jnp.zeros_like(v)), axis=1)
    return jnp.concatenate([hi.reshape(M, R2 // 2), lo.reshape(M, R2 // 2)], axis=1)

@jax.jit
def gather_current(v, i):
    cex = make_cex(v)
    return cex[jnp.minimum(i, M - 1)]

@jax.jit
def gather_rowmajor(v, i):
    cex = make_cex(v)
    flat = cex.reshape(M * R2)
    (flat,) = lax.optimization_barrier((flat,))
    cex = flat.reshape(M, R2)
    return cex[jnp.minimum(i, M - 1)]

@jax.jit
def gather_sorted_flag(v, i):
    cex = make_cex(v)
    return cex.at[jnp.minimum(i, M - 1)].get(indices_are_sorted=True,
                                             mode="promise_in_bounds")

@jax.jit
def gather_rowmajor_sorted(v, i):
    cex = make_cex(v)
    flat = cex.reshape(M * R2)
    (flat,) = lax.optimization_barrier((flat,))
    cex = flat.reshape(M, R2)
    return cex.at[jnp.minimum(i, M - 1)].get(indices_are_sorted=True,
                                             mode="promise_in_bounds")

timeit("current (scan-layout) row gather", gather_current, vals, idx)
timeit("row-major barrier + gather", gather_rowmajor, vals, idx)
timeit("current + indices_are_sorted", gather_sorted_flag, vals, idx)
timeit("row-major + indices_are_sorted", gather_rowmajor_sorted, vals, idx)
