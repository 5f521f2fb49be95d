"""Unit tests for the instance expansion + sort machinery."""

import jax.numpy as jnp
import numpy as np

from splat_trainer_tpu.core.types import RasterConfig
from splat_trainer_tpu.ops import tiling


def test_tile_grid():
    grid = tiling.make_tile_grid((64, 48), 16)
    assert grid.ntx == 4 and grid.nty == 3 and grid.num_tiles == 12
    assert grid.tile_bits >= 4
    assert grid.tile_bits + grid.depth_bits == 32


def test_expand_and_sort_basic():
    # two gaussians: one covering a 2x2 tile rect, one covering a single tile
    mean = jnp.array([[24.0, 24.0], [40.0, 8.0]])
    radius = jnp.array([10.0, 3.0])
    visible = jnp.array([True, True])
    depth_ndc = jnp.array([0.5, 0.2])

    config = RasterConfig(max_instances=128, chunk_size=8)
    grid = tiling.make_tile_grid((64, 48), 16)

    inst = tiling.expand_and_sort(mean, radius, visible, depth_ndc, config, grid)
    # gaussian 0: x,y in [14, 34] -> tiles [0,3) x [0,3) = 9 instances;
    # gaussian 1: single tile (2, 0)
    assert int(inst.total) == 10
    assert int(inst.clipped) == 0

    valid = np.asarray(inst.valid)
    gids = np.asarray(inst.gaussian_id)[valid]
    tiles = np.asarray(inst.tile_id)[valid]
    assert (np.sort(gids) == np.array([0] * 9 + [1])).all()
    # gaussian 1 is at pixel (40, 8) -> tile (2, 0) -> id 2
    assert tiles[gids == 1][0] == 2
    # tiles grouped ascending
    assert (np.diff(tiles) >= 0).all()

    # tile ranges: chunk-aligned starts, each range contains only that tile
    starts = np.asarray(inst.tile_starts)
    counts = np.asarray(inst.tile_counts)
    tile_full = np.asarray(inst.tile_id)
    valid_full = np.asarray(inst.valid)
    for t in range(grid.num_tiles):
        assert starts[t] % config.chunk_size == 0
        seg = tile_full[starts[t]:starts[t] + counts[t]]
        assert (seg == t).all()
        assert valid_full[starts[t]:starts[t] + counts[t]].all()
    assert counts.sum() == int(inst.total)
    assert valid_full.sum() == int(inst.total)


def test_depth_ordering_within_tile():
    # several gaussians in the same tile must sort front-to-back
    n = 10
    mean = jnp.tile(jnp.array([[8.0, 8.0]]), (n, 1))
    radius = jnp.full((n,), 2.0)
    visible = jnp.ones((n,), bool)
    depth_ndc = jnp.linspace(0.9, 0.1, n)  # reversed depths

    config = RasterConfig(max_instances=64, chunk_size=8)
    grid = tiling.make_tile_grid((16, 16), 16)
    inst = tiling.expand_and_sort(mean, radius, visible, depth_ndc, config, grid)

    valid = np.asarray(inst.valid)
    gids = np.asarray(inst.gaussian_id)[valid]
    depths = np.asarray(depth_ndc)[gids]
    assert (np.diff(depths) >= 0).all()


def test_overflow_counted():
    n = 50
    mean = jnp.tile(jnp.array([[8.0, 8.0]]), (n, 1))
    radius = jnp.full((n,), 2.0)
    visible = jnp.ones((n,), bool)
    depth_ndc = jnp.linspace(0.1, 0.9, n)

    config = RasterConfig(max_instances=32, chunk_size=8)
    grid = tiling.make_tile_grid((16, 16), 16)
    inst = tiling.expand_and_sort(mean, radius, visible, depth_ndc, config, grid)
    assert int(inst.total) == 32
    assert int(inst.clipped) == 18


def test_alignment_never_drops():
    # 3 tiles x 3 instances each; chunk alignment pads each tile's range to 8.
    # The aligned capacity Ma = Mr + num_tiles * chunk budgets the worst-case
    # padding, so alignment can NEVER drop a survivor (the backward's
    # gid-sort reduction relies on every survivor holding a slot) — all 9
    # instances keep slots at 8-aligned starts and nothing is clipped.
    mean = jnp.array([[8.0, 8.0]] * 3 + [[24.0, 8.0]] * 3 + [[40.0, 8.0]] * 3)
    radius = jnp.full((9,), 2.0)
    visible = jnp.ones((9,), bool)
    depth_ndc = jnp.linspace(0.1, 0.9, 9)

    config = RasterConfig(max_instances=16, chunk_size=8)
    grid = tiling.make_tile_grid((48, 16), 16)
    inst = tiling.expand_and_sort(mean, radius, visible, depth_ndc, config, grid)
    assert int(inst.total) == 9
    assert int(inst.clipped) == 0
    assert np.asarray(inst.tile_starts)[:3].tolist() == [0, 8, 16]
    assert np.asarray(inst.tile_counts).tolist() == [3, 3, 3]
    # compact ranks: stable gid sort of the aligned stream must reproduce
    # the seg_start/seg_end numbering exactly
    valid = np.asarray(inst.valid)
    gids = np.asarray(inst.gaussian_id)
    order = np.argsort(np.where(valid, gids, 9), kind="stable")
    compact_gids = gids[order][: int(inst.total)]
    for g in range(9):
        s, e = int(inst.seg_start[g]), int(inst.seg_end[g])
        assert (compact_gids[s:e] == g).all()


def test_invisible_produce_no_instances():
    mean = jnp.array([[8.0, 8.0]])
    radius = jnp.array([5.0])
    visible = jnp.array([False])
    depth_ndc = jnp.array([0.5])
    config = RasterConfig(max_instances=16, chunk_size=8)
    grid = tiling.make_tile_grid((16, 16), 16)
    inst = tiling.expand_and_sort(mean, radius, visible, depth_ndc, config, grid)
    assert int(inst.total) == 0


def test_radix_sort_matches_argsort():
    from splat_trainer_tpu.ops.sort import radix_argsort, radix_sort
    rng = np.random.RandomState(0)
    keys = jnp.asarray(rng.randint(0, 1 << 18, size=20_000, dtype=np.int32))
    payload = jnp.arange(20_000, dtype=jnp.int32)
    sk, sp = radix_sort(keys, payload, num_bits=18)
    ref = np.argsort(np.asarray(keys), kind="stable")
    np.testing.assert_array_equal(np.asarray(sp), ref)
    np.testing.assert_array_equal(np.asarray(sk), np.asarray(keys)[ref])
    sk2, order = radix_argsort(keys, num_bits=18)
    np.testing.assert_array_equal(np.asarray(order), ref)
