"""Dev: isolate the backward-path glue costs at bench scale."""

import sys, time, functools
sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np


def timeit(name, fn, *args, iters=10):
    t0 = time.time()
    out = jax.block_until_ready(fn(*args))
    ct = time.time() - t0
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    print(f"{name:36s} compile {ct:7.1f}s   run {(time.time()-t0)/iters*1000:9.3f} ms", flush=True)
    return out


def main():
    print("backend:", jax.default_backend(), flush=True)
    M = 1 << 22
    N = 1_000_000
    key = jax.random.PRNGKey(0)

    grads_t = jax.random.normal(key, (16, M))
    gid = jnp.sort(jax.random.randint(key, (M,), 0, N, dtype=jnp.int32))
    gid_rand = jax.random.randint(key, (M,), 0, N, dtype=jnp.int32)
    valid = jnp.ones((M,), bool)

    timeit("transpose (16,4M)->(4M,16)", jax.jit(lambda x: x.T + 0.0), grads_t)

    def seg(grads_t, gid):
        g = jnp.where(valid[:, None], grads_t.T, 0.0)
        return jax.ops.segment_sum(g, gid, num_segments=N)

    timeit("T+where+segsum 4Mx16 -> 1M (rand)", jax.jit(seg), grads_t, gid_rand)
    timeit("T+where+segsum 4Mx16 -> 1M (sorted)", jax.jit(seg), grads_t, gid)

    timeit("segsum sorted flag", jax.jit(
        lambda g, i: jax.ops.segment_sum(g.T, i, num_segments=N,
                                         indices_are_sorted=True)),
        grads_t, gid)

    # alternative: scatter rows to presort order + cumsum + boundary gathers
    presort_idx = jax.random.permutation(key, M).astype(jnp.int32)
    offsets = jnp.sort(jax.random.randint(key, (N,), 0, M, dtype=jnp.int32))
    span = jnp.ones((N,), jnp.int32)

    def alt(grads_t, presort_idx):
        vals = grads_t.T
        pre = jnp.zeros_like(vals).at[presort_idx].set(vals, unique_indices=True)
        cum = jnp.cumsum(pre, axis=0)
        end = jnp.clip(offsets + span - 1, 0, M - 1)
        top = cum[end]
        bot = jnp.where((offsets > 0)[:, None], cum[jnp.maximum(offsets - 1, 0)], 0.0)
        return jnp.where((span > 0)[:, None], top - bot, 0.0)

    timeit("alt: scatter+cumsum+bounds", jax.jit(alt), grads_t, presort_idx)

    vis = jax.random.uniform(key, (1, M))
    timeit("segsum vis (4M,) -> 1M", jax.jit(
        lambda v, i: jax.ops.segment_sum(v[0], i, num_segments=N)), vis, gid_rand)

    # scalar scatter-add into 1M (for comparison with micro's 100k result)
    timeit("scatter-add 4M -> 1M scalar", jax.jit(
        lambda v, i: jnp.zeros((N,)).at[i].add(v[0])), vis, gid_rand)


if __name__ == "__main__":
    main()
