"""Pallas slab kernels vs the XLA block path, in interpret mode
(SURVEY.md section 5: interpret mode is the kernel "sanitizer" — the
same kernel code compiled on TPU is exercised here on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import solr_tpu as st
from solr_tpu.ops import packet as pk
from solr_tpu.ops.camera import camera_rays
from solr_tpu.ops.pallas_kernels import (
    make_rays16,
    slab_closest_pallas,
    slab_transmittance_pallas,
)

from scenes_fixtures import random_tri_field

CAM = st.Camera.create(position=(0, 0, -6.0), fov=1.0)
SB = 256  # 16x16 pixel sub-bundles
K = 8


@pytest.fixture(scope="module")
def setup():
    scene = random_tri_field(1200).build(bvh_threshold=64)
    accel = scene.tri_accel
    cfg = st.RenderConfig(width=64, height=64)
    o, d = camera_rays(CAM, cfg)
    perm, _ = pk.tile_permutation(64, 64, 16, 16)
    o_t = o[perm].reshape(-1, SB, 3).astype(jnp.float32)
    d_t = d[perm].reshape(-1, SB, 3).astype(jnp.float32)
    po, ro, axis, cos_g = pk.make_bundles(o_t, d_t)
    mask1, near1 = pk.cull_blocks(
        po, ro, axis, cos_g, accel.sb_bounds[:, 0:3], accel.sb_bounds[:, 3:6]
    )
    cand, counts, near_sorted, near_bound, dropped = pk.two_level_select(
        mask1, near1, accel.block_bounds,
        lambda bbg: pk.cull_blocks_g(po, ro, axis, cos_g, bbg), 8, K,
    )
    slab = jnp.take(accel.packed, cand, axis=0)
    return accel, o_t, d_t, slab, cand, counts, near_bound


class TestClosest:
    def test_matches_xla_packet(self, setup):
        accel, o_t, d_t, slab, cand, counts, near_bound = setup
        t_x, i_x = pk.tri_blocks_closest(
            accel.packed, o_t, d_t, cand, counts, 1e-4
        )
        rays16 = make_rays16(o_t, d_t)
        t_p, i_p = slab_closest_pallas(
            slab, rays16, cand, counts, near_bound, 1e-4, interpret=True
        )
        np.testing.assert_allclose(np.asarray(t_p), np.asarray(t_x),
                                   rtol=1e-6)
        hit = np.asarray(t_x) < 1e30
        np.testing.assert_array_equal(
            np.asarray(i_p)[hit], np.asarray(i_x)[hit]
        )

    def test_early_out_does_not_change_result(self, setup):
        """Early termination must be conservative: compare against a run
        where the near bounds are all zero (no skipping possible)."""
        accel, o_t, d_t, slab, cand, counts, near_bound = setup
        rays16 = make_rays16(o_t, d_t)
        t_e, _ = slab_closest_pallas(
            slab, rays16, cand, counts, near_bound, 1e-4, interpret=True
        )
        t_n, _ = slab_closest_pallas(
            slab, rays16, cand, counts, jnp.zeros_like(near_bound), 1e-4,
            interpret=True,
        )
        np.testing.assert_allclose(np.asarray(t_e), np.asarray(t_n),
                                   rtol=1e-6)


class TestTransmittance:
    def test_matches_xla_packet(self, setup):
        accel, o_t, d_t, slab, cand, counts, near_bound = setup
        t_max = jnp.full(o_t.shape[:2], 50.0, jnp.float32)
        tr_x = pk.tri_blocks_transmittance(
            accel.packed, o_t, d_t, t_max, cand, counts, 1e-4
        )
        rays16 = make_rays16(o_t, d_t, t_max)
        tr_p = slab_transmittance_pallas(
            slab, rays16, counts, 1e-4, interpret=True
        )
        np.testing.assert_allclose(np.asarray(tr_p), np.asarray(tr_x),
                                   rtol=1e-6)
