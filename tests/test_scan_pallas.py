"""Parity tests for the Pallas 1D scan kernel vs jnp (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from splat_trainer_tpu.ops import scan_pallas


@pytest.mark.parametrize("m", [7, 128, 32768, 32769, 100_000])
def test_cumsum_i32(m):
    rng = np.random.RandomState(m)
    x = jnp.asarray(rng.randint(0, 50, size=m, dtype=np.int32))
    got = scan_pallas.cumsum_interpret(x)
    np.testing.assert_array_equal(np.asarray(got),
                                  np.cumsum(np.asarray(x), dtype=np.int64))


@pytest.mark.parametrize("m", [5, 300, 33000])
def test_cummax_i32(m):
    rng = np.random.RandomState(m)
    # include negative ids and long plateaus (the gid-fill access pattern)
    x = jnp.asarray(rng.randint(-100, 1000, size=m, dtype=np.int32))
    got = scan_pallas.cummax_interpret(x)
    np.testing.assert_array_equal(np.asarray(got),
                                  np.maximum.accumulate(np.asarray(x)))


def test_cumsum_f32():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.uniform(-1, 1, size=40_000).astype(np.float32))
    got = scan_pallas.cumsum_interpret(x)
    ref = np.cumsum(np.asarray(x, np.float64)).astype(np.float32)
    np.testing.assert_allclose(np.asarray(got), ref, rtol=2e-4, atol=2e-4)


def test_cpu_fallback_matches():
    x = jnp.arange(1000, dtype=jnp.int32) % 37
    np.testing.assert_array_equal(np.asarray(scan_pallas.cumsum(x)),
                                  np.cumsum(np.asarray(x)))
    np.testing.assert_array_equal(np.asarray(scan_pallas.cummax(x)),
                                  np.maximum.accumulate(np.asarray(x)))
