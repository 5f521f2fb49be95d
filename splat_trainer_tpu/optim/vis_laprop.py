"""Visibility-aware sparse point optimizers (LaProp / Adam) as pure updates.

TPU-native equivalent of taichi-splatting's `VisibilityAwareLaProp` /
`VisibilityAwareAdam` + `ParameterClass` (SURVEY.md N6; usage
/root/reference/splat_trainer/scene/mlp_scene.py:58-60, 216-239). Semantics:

- Only points rendered this step (visibility > 0) receive moment updates and
  parameter steps. On TPU, "sparse" is *masked-dense* over the capacity
  axis: a gather/scatter pair is slower than a predicated dense VPU pass at
  the densities seen in training (SURVEY.md §7.1 decision 5).
- Gradients are normalized by per-point visibility (`g / (vis + vis_smooth)`)
  so a point seen by many pixels doesn't dominate, then norm-clipped per
  point (`grad_clip`).
- A `vis_beta` EMA of per-point visibility rescales the effective step so
  rarely-seen points aren't over-stepped by stale second moments.
- `local_vector` parameter groups (position) are optimized in the gaussian's
  local basis B = R diag(s): the gradient is pulled back by B^T, moments
  live in local coordinates, and the step is pushed forward by B — a
  shape-aware preconditioner (mlp_scene.py:216-230).
- Per-point visible-step counts drive bias correction (points joining late
  via densification start with fresh moments).

LaProp (Ziyin et al. 2020) decouples the moments: the second moment
normalizes the gradient *before* momentum accumulation:
    nu   <- b2 nu + (1-b2) g^2
    m    <- b1 m + (1-b1) g / (sqrt(nu_hat) + eps)
    step <- lr * m_hat
"""

from typing import Dict, Literal, NamedTuple, Optional

import jax
import jax.numpy as jnp
from flax import struct

from splat_trainer_tpu.utils import transforms

ParamType = Literal["scalar", "vector", "local_vector"]


class ParamGroup(NamedTuple):
    """Static per-tensor optimizer settings (reference parameter_groups,
    config/scene/mlp.yaml)."""
    type: ParamType = "scalar"


@struct.dataclass
class PointOptimizerState:
    mu: Dict[str, jax.Array]       # first moments, shaped like params
    nu: Dict[str, jax.Array]       # second moments
    vis_ema: jax.Array             # (N,) EMA of visibility
    steps: jax.Array               # (N,) int32 — visible-step count per point


def point_optimizer_init(params: Dict[str, jax.Array]) -> PointOptimizerState:
    n = next(iter(params.values())).shape[0]
    zeros_like = lambda p: jnp.zeros_like(p)
    return PointOptimizerState(
        mu={k: zeros_like(v) for k, v in params.items()},
        nu={k: zeros_like(v) for k, v in params.items()},
        vis_ema=jnp.zeros((n,), jnp.float32),
        steps=jnp.zeros((n,), jnp.int32),
    )


def _point_basis(log_scaling: jax.Array, rotation: jax.Array, eps: float = 1e-4):
    """B = R diag(max(exp(log_s), eps)) (reference gaussians/split.py:16)."""
    scale = jnp.maximum(jnp.exp(log_scaling), eps)
    r = transforms.quat_to_rotmat(transforms.normalize(rotation))
    return r * scale[:, None, :]


def point_optimizer_update(
    params: Dict[str, jax.Array],
    grads: Dict[str, jax.Array],
    state: PointOptimizerState,
    visibility: jax.Array,                  # (N,) this-step visibility weights
    lrs: Dict[str, jax.Array],              # per-group learning rates (traced)
    groups: Dict[str, ParamGroup],          # static group settings
    *,
    algorithm: str = "laprop",              # "laprop" | "adam"
    beta1: float = 0.8,
    beta2: float = 0.95,
    vis_beta: float = 0.999,
    vis_smooth: float = 0.01,
    grad_clip: Optional[float] = 2.0,
    eps: float = 1e-12,
    basis: Optional[jax.Array] = None,      # (N,3,3) for local_vector groups
):
    """One masked-dense optimizer step. Returns (new_params, new_state)."""
    visible = visibility > 0.0
    vism = visible.astype(jnp.float32)

    steps = state.steps + visible.astype(jnp.int32)
    t = jnp.maximum(steps, 1).astype(jnp.float32)
    bc1 = 1.0 - beta1 ** t
    bc2 = 1.0 - beta2 ** t

    # visibility EMA: how consistently this point is seen
    vis_ema = jnp.where(
        visible, vis_beta * state.vis_ema + (1.0 - vis_beta) * visibility,
        state.vis_ema)
    vis_bc = 1.0 - vis_beta ** t
    vis_hat = vis_ema / jnp.maximum(vis_bc, 1e-12)
    # step scale: down-weight updates where this step's visibility is small
    # relative to the point's typical visibility
    step_scale = visibility / jnp.maximum(
        jnp.maximum(vis_hat, visibility), vis_smooth)

    if basis is None and any(g.type == "local_vector" for g in groups.values()):
        basis = _point_basis(params["log_scaling"], params["rotation"])

    new_params, new_mu, new_nu = {}, {}, {}
    for name, p in params.items():
        g = grads[name]
        group = groups.get(name, ParamGroup())
        flat = g.reshape(g.shape[0], -1)

        # normalize by visibility (sum of compositing weights)
        flat = flat / (visibility[:, None] + vis_smooth)

        if group.type == "local_vector":
            flat = jnp.einsum("nij,nj->ni", jnp.swapaxes(basis, -1, -2), flat)

        if grad_clip is not None:
            norm = jnp.linalg.norm(flat, axis=-1, keepdims=True)
            flat = flat * jnp.minimum(1.0, grad_clip / jnp.maximum(norm, eps))

        mu, nu = state.mu[name].reshape(flat.shape), state.nu[name].reshape(flat.shape)
        m = vism[:, None]

        nu_next = jnp.where(m > 0, beta2 * nu + (1 - beta2) * flat * flat, nu)
        nu_hat = nu_next / bc2[:, None]

        if algorithm == "laprop":
            normed = flat / (jnp.sqrt(nu_hat) + eps)
            mu_next = jnp.where(m > 0, beta1 * mu + (1 - beta1) * normed, mu)
            update = mu_next / bc1[:, None]
        else:  # adam
            mu_next = jnp.where(m > 0, beta1 * mu + (1 - beta1) * flat, mu)
            update = (mu_next / bc1[:, None]) / (jnp.sqrt(nu_hat) + eps)

        lr = lrs[name]
        step = lr * update * step_scale[:, None]

        if group.type == "local_vector":
            step = jnp.einsum("nij,nj->ni", basis, step)

        p_next = p - jnp.where(m > 0, step, 0.0).reshape(p.shape)
        new_params[name] = p_next
        new_mu[name] = mu_next.reshape(p.shape)
        new_nu[name] = nu_next.reshape(p.shape)

    return new_params, PointOptimizerState(
        mu=new_mu, nu=new_nu, vis_ema=vis_ema, steps=steps)


def reset_slots(state: PointOptimizerState, mask: jax.Array) -> PointOptimizerState:
    """Zero optimizer state at slots where `mask` is True (densify rebuild;
    reference ParameterClass.append_tensors / index semantics)."""
    zero = lambda x: jnp.where(
        mask.reshape((-1,) + (1,) * (x.ndim - 1)), jnp.zeros_like(x), x)
    return PointOptimizerState(
        mu={k: zero(v) for k, v in state.mu.items()},
        nu={k: zero(v) for k, v in state.nu.items()},
        vis_ema=jnp.where(mask, 0.0, state.vis_ema),
        steps=jnp.where(mask, 0, state.steps),
    )
