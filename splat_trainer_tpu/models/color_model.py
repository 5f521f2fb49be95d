"""Learned MLP color model with GLO embeddings, as pure functions + pytrees.

Capability equivalent of the reference ColorModel/GLOTable
(/root/reference/splat_trainer/scene/color_model.py:11-174,
scene/mlp/torch_mlp.py:24-135):

- per-point feature || per-image GLO feature -> LayerNorm -> two heads:
  * base (diffuse) GLU-MLP -> [intensity, rgb]
  * directional (specular): view direction SH-encoded (degree 5) and
    projected to a per-feature affine modulation (x*a + b) -> GLU-MLP ->
    [intensity, rgb] with -2 intensity bias
- luminance activation: sigmoid(rgb) * exp(intensity)

TPU-first details: the MLP runs in bfloat16 over the *entire capacity
axis* (a 1M x 48 x 32 matmul is ~0.1 ms on the MXU — cheaper than a
gather/scatter of only-visible points; mirrors the fp16 autocast at
mlp_scene.py:362). LayerNorm statistics in f32.
"""

import math
from dataclasses import dataclass, field
from typing import Any, Dict

import jax
import jax.numpy as jnp

from splat_trainer_tpu.config import VaryingFloat, LogDecay
from splat_trainer_tpu.ops.sh import num_sh_coeffs, sh_basis


@dataclass(frozen=True)
class ColorModelConfig:
    """Mirrors reference ColorModelConfig (color_model.py:50-68) +
    config/scene/mlp.yaml defaults."""
    hidden_features: int = 32
    hidden_layers: int = 1
    sh_degree: int = 5
    color_channels: int = 3
    hdr: bool = False
    lr_diffuse: VaryingFloat = field(default_factory=lambda: LogDecay(0.01, 0.01))
    lr_specular: VaryingFloat = field(default_factory=lambda: LogDecay(0.01, 0.01))


def _linear_init(key, n_in, n_out):
    """torch nn.Linear default init: U(-1/sqrt(n_in), 1/sqrt(n_in))."""
    kw, kb = jax.random.split(key)
    bound = 1.0 / math.sqrt(n_in)
    return {
        "w": jax.random.uniform(kw, (n_in, n_out), jnp.float32, -bound, bound),
        "b": jax.random.uniform(kb, (n_out,), jnp.float32, -bound, bound),
    }


def _mlp_init(key, n_in, n_out, hidden, hidden_layers):
    """GLU MLP: hidden GLULayers (Linear to 2h, gate) + final Linear."""
    sizes = [n_in] + [hidden] * hidden_layers
    keys = jax.random.split(key, len(sizes))
    layers = [_linear_init(keys[i], sizes[i], sizes[i + 1] * 2)
              for i in range(len(sizes) - 1)]
    final = _linear_init(keys[-1], sizes[-1], n_out)
    return {"layers": layers, "final": final}


def _mlp_apply(params, x):
    for layer in params["layers"]:
        h = x @ layer["w"] + layer["b"]
        a, b = jnp.split(h, 2, axis=-1)
        x = a * jax.nn.sigmoid(b)          # GLU
    return x @ params["final"]["w"] + params["final"]["b"]


def init_color_model(key, config: ColorModelConfig, glo_features: int,
                     point_features: int) -> Dict[str, Any]:
    feature_size = glo_features + point_features
    n_out = config.color_channels + 1
    k1, k2, k3 = jax.random.split(key, 3)
    sh_size = num_sh_coeffs(config.sh_degree)
    return {
        "base": _mlp_init(k1, feature_size, n_out, config.hidden_features,
                          config.hidden_layers),
        "spec": _mlp_init(k2, feature_size, n_out, config.hidden_features,
                          config.hidden_layers),
        # direction SH -> per-feature affine (a, b); reference ProjectSH with
        # proj_hidden_layers=0 == single Linear (torch_mlp.py:52-66)
        "dir_proj": _linear_init(k3, sh_size, feature_size * 2),
    }


def _layernorm(x, eps: float = 1e-5):
    x32 = x.astype(jnp.float32)
    mu = x32.mean(axis=-1, keepdims=True)
    var = x32.var(axis=-1, keepdims=True)
    return (x32 - mu) * jax.lax.rsqrt(var + eps)


def luminance_activation(rgbl, intensity_bias: float = 0.0):
    """[intensity, rgb...] -> sigmoid(rgb) * exp(intensity + bias)
    (reference color_model.py:71-75)."""
    intensity, rgb = rgbl[:, 0:1], rgbl[:, 1:]
    return jax.nn.sigmoid(rgb) * jnp.exp(intensity + intensity_bias)


def eval_colors(params, config: ColorModelConfig,
                point_features: jax.Array,     # (N, F_p)
                positions: jax.Array,          # (N, 3)
                cam_pos: jax.Array,            # (3,)
                glo_feature: jax.Array,        # (F_g,)
                compute_dtype=jnp.bfloat16):
    """Returns (diffuse (N, 3), specular (N, 3))."""
    n = point_features.shape[0]
    glo = jnp.broadcast_to(glo_feature[None, :], (n, glo_feature.shape[0]))
    feature = jnp.concatenate([point_features, glo], axis=-1)
    feature = _layernorm(feature).astype(compute_dtype)

    p = jax.tree_util.tree_map(lambda x: x.astype(compute_dtype), params)

    diffuse = luminance_activation(
        _mlp_apply(p["base"], feature).astype(jnp.float32))

    d = jax.lax.stop_gradient(positions) - cam_pos[None, :]
    d = d / jnp.maximum(jnp.linalg.norm(d, axis=-1, keepdims=True), 1e-12)
    enc = sh_basis(d, config.sh_degree).astype(compute_dtype)
    ab = enc @ p["dir_proj"]["w"] + p["dir_proj"]["b"]
    a, b = jnp.split(ab, 2, axis=-1)
    specular = luminance_activation(
        _mlp_apply(p["spec"], feature * a + b).astype(jnp.float32),
        intensity_bias=-2.0)

    return diffuse, specular


def total_color(diffuse, specular, specular_weight: float = 1.0):
    return diffuse + specular * specular_weight


def post_activation(image: jax.Array, config: ColorModelConfig) -> jax.Array:
    """Clamp to displayable range unless HDR (color_model.py:154-160)."""
    if config.hdr:
        return image
    return jnp.clip(image[..., :3], 0.0, 1.0)


def init_glo_table(num_embeddings: int, glo_features: int) -> jax.Array:
    """Per-image GLO embeddings, zero-initialized (color_model.py:11-17)."""
    return jnp.zeros((num_embeddings, glo_features), jnp.float32)
