"""Color metrics + affine color-correction fitting.

Capability equivalent of /root/reference/splat_trainer/util/colors.py:23-104:
PSNR and the iterated least-squares quadratic color warp used for
color-corrected evaluation metrics (evaluation.py:48-50).
"""

import jax
import jax.numpy as jnp


def compute_psnr(pred: jnp.ndarray, ref: jnp.ndarray) -> jnp.ndarray:
    mse = ((pred - ref) ** 2).mean()
    return 10.0 * jnp.log10(1.0 / jnp.maximum(mse, 1e-10))


def _design_matrix(x: jnp.ndarray) -> jnp.ndarray:
    """Quadratic color features: [rgb, rgb^2, 1] per pixel -> (P, 7)."""
    return jnp.concatenate([x, x * x, jnp.ones_like(x[:, :1])], axis=-1)


@jax.jit
def fit_colors(pred: jnp.ndarray, ref: jnp.ndarray, iters: int = 5) -> jnp.ndarray:
    """Fit a per-image quadratic color transform pred -> ref by iterated
    least squares over unsaturated pixels (reference fit_colors_batch,
    util/colors.py:32-104). Returns the corrected image."""
    h, w, c = pred.shape
    x = pred.reshape(-1, c)
    y = ref.reshape(-1, c)
    feats = _design_matrix(x)                      # (P, 7)

    weight = jnp.ones((x.shape[0], 1))

    def body(_i, carry):
        weight, corrected = carry
        a = feats * weight
        b = y * weight
        # normal equations in f64-free form; regularized for stability
        ata = a.T @ a + 1e-4 * jnp.eye(feats.shape[1])
        atb = a.T @ b
        coef = jnp.linalg.solve(ata, atb)          # (7, C)
        corrected = feats @ coef
        # refit using only unsaturated pixels of the correction
        unsat = ((corrected > 0.02) & (corrected < 0.98)).all(
            axis=-1, keepdims=True)
        return unsat.astype(jnp.float32) + 1e-3, corrected

    _, corrected = jax.lax.fori_loop(0, iters, body, (weight, y))
    return jnp.clip(corrected.reshape(h, w, c), 0.0, 1.0)
