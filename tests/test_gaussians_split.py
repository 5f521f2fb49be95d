import jax
import jax.numpy as jnp
import numpy as np

from splat_trainer_tpu.models import gaussians as G
from splat_trainer_tpu.utils import transforms


def make_points(n, key=jax.random.PRNGKey(0)):
    k1, k2 = jax.random.split(key)
    return {
        "position": jax.random.normal(k1, (n, 3)),
        "rotation": transforms.normalize(jax.random.normal(k2, (n, 4))),
        "log_scaling": jnp.zeros((n, 3)).at[:, 0].set(1.0),
        "alpha_logit": jnp.zeros((n, 1)),
        "feature": jnp.arange(n, dtype=jnp.float32)[:, None].repeat(4, 1),
    }


def test_split_children_geometry():
    pts = make_points(4)
    children = G.split_children(pts, key=None, k=2)
    # argmax axis is x (log_scaling[:,0]=1): children offset along the
    # basis x-axis, scale shrunk by 1/sqrt(2) along x only
    assert children["position"].shape == (4, 2, 3)
    np.testing.assert_allclose(
        children["log_scaling"][:, 0, 0], 1.0 - 0.5 * np.log(2.0), atol=1e-6)
    np.testing.assert_allclose(children["log_scaling"][:, 0, 1], 0.0, atol=1e-6)
    # children are symmetric about the parent
    mid = children["position"].mean(axis=1)
    np.testing.assert_allclose(mid, pts["position"], atol=1e-5)
    # offset magnitude = sep * scale_x = 0.7 * e^1
    d = np.linalg.norm(np.asarray(children["position"][:, 0] - pts["position"]), axis=-1)
    np.testing.assert_allclose(d, 0.7 * np.e, rtol=1e-4)


def test_apply_split_prune_slots():
    n = 16
    pts = make_points(n)
    active = jnp.zeros((n,), bool).at[:10].set(True)

    split_mask = jnp.zeros((n,), bool).at[jnp.array([2, 5])].set(True)
    prune_mask = jnp.zeros((n,), bool).at[jnp.array([7, 8])].set(True)

    new_pts, new_active, touched, dropped = G.apply_split_prune(
        pts, active, split_mask, prune_mask, key=None)

    # 10 - 2 (split parents) - 2 (pruned) + 4 children = 10
    assert int(new_active.sum()) == 10
    assert int(dropped) == 0
    # parents and pruned are inactive... unless reused as child slots
    assert int(touched.sum()) == 4
    # children inherit parent features
    feats = np.asarray(new_pts["feature"])[np.asarray(touched)]
    parents = set(feats[:, 0].tolist())
    assert parents == {2.0, 5.0}
    # untouched survivors unchanged
    survivors = np.asarray(new_active & ~touched)
    np.testing.assert_allclose(
        np.asarray(new_pts["position"])[survivors],
        np.asarray(pts["position"])[survivors])


def test_split_overflow_dropped_counted():
    n = 8
    pts = make_points(n)
    active = jnp.ones((n,), bool)  # no free slots
    split_mask = jnp.zeros((n,), bool).at[jnp.array([0, 1, 2])].set(True)
    prune_mask = jnp.zeros((n,), bool)

    new_pts, new_active, touched, dropped = G.apply_split_prune(
        pts, active, split_mask, prune_mask, key=None)
    # 3 parents removed -> 3 free slots -> 3 of 6 children fit
    assert int(dropped) == 3
    assert int(new_active.sum()) == 8
