"""Straight-through estimators (reference util/straight_through.py:5-43;
unused in the reference's main path, provided for parity)."""

import jax
import jax.numpy as jnp


def straight_through(f):
    """Apply f in the forward pass, identity in the backward pass."""

    def wrapped(x):
        return x + jax.lax.stop_gradient(f(x) - x)

    return wrapped


clamp_st = straight_through(lambda x: jnp.clip(x, 0.0, 1.0))
round_st = straight_through(jnp.round)


def sign_st(x):
    return x + jax.lax.stop_gradient(jnp.sign(x) - x)
