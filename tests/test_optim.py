import jax
import jax.numpy as jnp
import numpy as np

from splat_trainer_tpu.optim import (
    ParamGroup, adam_init, adam_update, point_optimizer_init,
    point_optimizer_update, row_adam_init, row_adam_update,
)
from splat_trainer_tpu.optim.vis_laprop import reset_slots
from splat_trainer_tpu.utils import transforms


def make_points(n=32, key=jax.random.PRNGKey(0)):
    k1, k2 = jax.random.split(key)
    return {
        "position": jax.random.normal(k1, (n, 3)),
        "rotation": transforms.normalize(jax.random.normal(k2, (n, 4))),
        "log_scaling": jnp.zeros((n, 3)),
        "alpha_logit": jnp.zeros((n, 1)),
    }


GROUPS = {
    "position": ParamGroup(type="local_vector"),
    "rotation": ParamGroup(type="vector"),
    "log_scaling": ParamGroup(type="scalar"),
    "alpha_logit": ParamGroup(type="scalar"),
}
LRS = {"position": 0.1, "rotation": 0.01, "log_scaling": 0.05, "alpha_logit": 0.05}


def test_invisible_points_not_updated():
    params = make_points()
    grads = {k: jnp.ones_like(v) for k, v in params.items()}
    state = point_optimizer_init(params)
    vis = jnp.zeros((32,)).at[:8].set(1.0)

    new_params, new_state = point_optimizer_update(
        params, grads, state, vis, LRS, GROUPS)

    for k in params:
        np.testing.assert_allclose(new_params[k][8:], params[k][8:])
        assert not np.allclose(new_params[k][:8], params[k][:8]), k
    assert (np.asarray(new_state.steps)[:8] == 1).all()
    assert (np.asarray(new_state.steps)[8:] == 0).all()


def test_descends_quadratic():
    """The optimizer should minimize a simple quadratic on visible points."""
    params = make_points(16)
    target = params["position"] + 1.0
    state = point_optimizer_init(params)
    vis = jnp.ones((16,))

    p = params
    for _ in range(200):
        g = {k: jnp.zeros_like(v) for k, v in p.items()}
        g["position"] = p["position"] - target
        p, state = point_optimizer_update(p, g, state, vis, LRS, GROUPS)

    err = np.abs(np.asarray(p["position"] - target)).max()
    assert err < 0.15, err


def test_local_basis_scales_step():
    """Points with larger scale should take larger world-space position steps."""
    params = make_points(2)
    params["rotation"] = jnp.tile(jnp.array([[0.0, 0.0, 0.0, 1.0]]), (2, 1))
    params["log_scaling"] = jnp.array([[0.0, 0.0, 0.0], [2.0, 2.0, 2.0]])
    grads = {k: jnp.zeros_like(v) for k, v in params.items()}
    grads["position"] = jnp.ones((2, 3)) * 1e-3  # small to avoid clip

    state = point_optimizer_init(params)
    new_params, _ = point_optimizer_update(
        params, grads, state, jnp.ones((2,)), LRS, GROUPS, grad_clip=None)

    step = np.abs(np.asarray(new_params["position"] - params["position"]))
    assert step[1].mean() > step[0].mean() * 2


def test_reset_slots():
    params = make_points(8)
    state = point_optimizer_init(params)
    vis = jnp.ones((8,))
    g = {k: jnp.ones_like(v) for k, v in params.items()}
    _, state = point_optimizer_update(params, g, state, vis, LRS, GROUPS)

    mask = jnp.zeros((8,), bool).at[3].set(True)
    state2 = reset_slots(state, mask)
    assert np.asarray(state2.steps)[3] == 0
    assert np.abs(np.asarray(state2.mu["position"][3])).max() == 0
    assert np.asarray(state2.steps)[0] == 1


def test_adam_converges():
    params = {"w": jnp.array([5.0, -3.0])}
    state = adam_init(params)
    for _ in range(500):
        grads = {"w": params["w"]}
        params, state = adam_update(params, grads, state, lr=0.05)
    assert np.abs(np.asarray(params["w"])).max() < 1e-2


def test_row_adam_masks_rows():
    table = jnp.ones((4, 8))
    state = row_adam_init(table)
    grads = jnp.ones_like(table)
    mask = jnp.array([True, False, True, False])
    new_table, state = row_adam_update(table, grads, state, mask, lr=0.1)
    assert not np.allclose(new_table[0], table[0])
    np.testing.assert_allclose(new_table[1], table[1])
