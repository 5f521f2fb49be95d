"""Plain Adam over an arbitrary pytree, with per-call (traced) learning rate.

Used for the color-model MLP (reference ColorModel.optimizer,
color_model.py:163-171 — Adam betas (0.9, 0.999) with log-decay lr
schedule). Written directly (rather than optax) so the learning rate is a
traced argument: schedule changes never retrigger compilation.
"""

from typing import Any

import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class AdamState:
    mu: Any
    nu: Any
    step: jax.Array


def adam_init(params) -> AdamState:
    zeros = lambda p: jnp.zeros_like(p)
    return AdamState(
        mu=jax.tree_util.tree_map(zeros, params),
        nu=jax.tree_util.tree_map(zeros, params),
        step=jnp.zeros((), jnp.int32),
    )


def adam_update(params, grads, state: AdamState, lr,
                beta1: float = 0.9, beta2: float = 0.999,
                eps: float = 1e-8, weight_decay: float = 0.0):
    step = state.step + 1
    t = step.astype(jnp.float32)
    bc1 = 1.0 - beta1 ** t
    bc2 = 1.0 - beta2 ** t

    def upd(p, g, mu, nu):
        if weight_decay:
            g = g + weight_decay * p
        mu = beta1 * mu + (1 - beta1) * g
        nu = beta2 * nu + (1 - beta2) * g * g
        p = p - lr * (mu / bc1) / (jnp.sqrt(nu / bc2) + eps)
        return p, mu, nu

    flat = jax.tree_util.tree_map(upd, params, grads, state.mu, state.nu)
    params = jax.tree_util.tree_map(lambda t3: t3[0], flat,
                                    is_leaf=lambda x: isinstance(x, tuple))
    mu = jax.tree_util.tree_map(lambda t3: t3[1], flat,
                                is_leaf=lambda x: isinstance(x, tuple))
    nu = jax.tree_util.tree_map(lambda t3: t3[2], flat,
                                is_leaf=lambda x: isinstance(x, tuple))
    return params, AdamState(mu=mu, nu=nu, step=step)
