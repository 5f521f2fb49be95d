"""Row-sparse Adam for embedding tables (GLO features).

Equivalent of torch SparseAdam + weight decay on the per-image GLO embedding
table (reference GLOTable.optimizer, color_model.py:36-42: SparseAdam,
betas (0.8, 0.95), weight_decay 1e-2). Only rows touched this step (mask)
receive moment/step updates; per-row step counts give bias correction.
Masked-dense on TPU — the table is (num_images, G), tiny.
"""

import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class RowAdamState:
    mu: jax.Array
    nu: jax.Array
    steps: jax.Array  # (rows,) int32


def row_adam_init(table: jax.Array) -> RowAdamState:
    return RowAdamState(
        mu=jnp.zeros_like(table),
        nu=jnp.zeros_like(table),
        steps=jnp.zeros((table.shape[0],), jnp.int32),
    )


def row_adam_update(table, grads, state: RowAdamState, row_mask, lr,
                    beta1: float = 0.8, beta2: float = 0.95,
                    eps: float = 1e-8, weight_decay: float = 1e-2):
    m = row_mask.astype(jnp.float32)[:, None]
    steps = state.steps + row_mask.astype(jnp.int32)
    t = jnp.maximum(steps, 1).astype(jnp.float32)[:, None]
    bc1 = 1.0 - beta1 ** t
    bc2 = 1.0 - beta2 ** t

    g = grads + weight_decay * table
    mu = jnp.where(m > 0, beta1 * state.mu + (1 - beta1) * g, state.mu)
    nu = jnp.where(m > 0, beta2 * state.nu + (1 - beta2) * g * g, state.nu)
    step = lr * (mu / bc1) / (jnp.sqrt(nu / bc2) + eps)
    table = table - jnp.where(m > 0, step, 0.0)
    return table, RowAdamState(mu=mu, nu=nu, steps=steps)
