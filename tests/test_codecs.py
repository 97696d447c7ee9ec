"""Property tests of the index codecs and scroll against the scalar oracle."""

import functools

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from semantic_dsp_map_tpu.config import tiny_test_config
from semantic_dsp_map_tpu.ops import codecs
from semantic_dsp_map_tpu.state import init_scroll

from oracle import ScrollOracle

_CFG = tiny_test_config()


@functools.partial(jax.jit)
def _pos_to_voxel(scroll, pts):
    return codecs.global_pos_to_voxel(_CFG, scroll, pts)


@functools.partial(jax.jit)
def _voxel_to_global(scroll, vs):
    return codecs.voxel_to_global_pos(_CFG, scroll, vs)


@pytest.fixture
def cfg():
    return _CFG


def make_oracle(cfg):
    return ScrollOracle(cfg.nx, cfg.ny, cfg.nz, cfg.voxel_size)


def test_ring_voxel_roundtrip(cfg):
    v = jnp.arange(cfg.num_voxels, dtype=jnp.int32)
    xi, yi, zi = codecs.voxel_to_ring(cfg, v)
    v2 = codecs.ring_to_voxel(cfg, xi, yi, zi)
    np.testing.assert_array_equal(np.asarray(v), np.asarray(v2))


def test_pos_to_voxel_matches_oracle_no_scroll(cfg):
    rng = np.random.RandomState(0)
    scroll = init_scroll(cfg)
    oracle = make_oracle(cfg)

    pts = rng.uniform(-3, 3, size=(500, 3)).astype(np.float32)
    v, xi, yi, zi, valid = _pos_to_voxel(scroll, jnp.asarray(pts))
    v, valid = np.asarray(v), np.asarray(valid)
    for i in range(len(pts)):
        expect = oracle.global_to_voxel(pts[i])
        if expect is None:
            assert not valid[i], pts[i]
        else:
            assert valid[i] and v[i] == expect, pts[i]


def test_scroll_sequence_matches_oracle(cfg):
    rng = np.random.RandomState(1)
    scroll = init_scroll(cfg)
    oracle = make_oracle(cfg)

    pos = np.zeros(3)
    for t in range(1, 30):
        # Random walk incl. occasional large jumps to hit the multi-step path.
        step = rng.uniform(-0.4, 0.6, 3)
        if t % 7 == 0:
            step = rng.uniform(-4, 6, 3)
        pos = pos + step
        scroll = codecs.update_ego_center(
            cfg, scroll, jnp.asarray(pos, jnp.float32), jnp.int32(t)
        )
        oracle.update_ego(pos.astype(np.float32), t)

        np.testing.assert_array_equal(np.asarray(scroll.moved_steps), oracle.moved)
        np.testing.assert_array_equal(np.asarray(scroll.equiv_steps), oracle.equiv)
        np.testing.assert_allclose(np.asarray(scroll.map_center), oracle.map_center, atol=1e-5)
        np.testing.assert_array_equal(np.asarray(scroll.axis_stamp_x), oracle.stamps[0])
        np.testing.assert_array_equal(np.asarray(scroll.axis_stamp_y), oracle.stamps[1])
        np.testing.assert_array_equal(np.asarray(scroll.axis_stamp_z), oracle.stamps[2])

        # Position<->voxel codecs agree under the scrolled state.
        pts = (pos + rng.uniform(-2, 2, size=(50, 3))).astype(np.float32)
        v, _, _, _, valid = _pos_to_voxel(scroll, jnp.asarray(pts))
        v, valid = np.asarray(v), np.asarray(valid)
        for i in range(len(pts)):
            expect = oracle.global_to_voxel(pts[i])
            if expect is None:
                assert not valid[i]
            else:
                assert valid[i] and v[i] == expect

        # voxel -> global position agrees.
        vs = rng.randint(0, cfg.num_voxels, 20)
        gp = np.asarray(
            _voxel_to_global(scroll, jnp.asarray(vs, jnp.int32))
        )
        for i, vv in enumerate(vs):
            np.testing.assert_allclose(gp[i], oracle.voxel_to_global(vv), atol=1e-4)


def test_roundtrip_pos_voxel_pos(cfg):
    """A position quantizes to a voxel whose corner is within one voxel size."""
    rng = np.random.RandomState(2)
    scroll = init_scroll(cfg)
    scroll = codecs.update_ego_center(
        cfg, scroll, jnp.asarray([1.3, -0.4, 0.9], jnp.float32), jnp.int32(1)
    )
    pts = (rng.uniform(-0.8, 0.8, size=(200, 3)) + np.array([1.3, -0.4, 0.9])).astype(np.float32)
    v, _, _, _, valid = _pos_to_voxel(scroll, jnp.asarray(pts))
    corners = np.asarray(_voxel_to_global(scroll, v))
    ok = np.asarray(valid)
    d = pts[ok] - corners[ok]
    assert np.all(d >= -1e-4) and np.all(d < cfg.voxel_size + 1e-4)
