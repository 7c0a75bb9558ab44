"""Pallas block-packet kernels vs the XLA block path, in interpret mode
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
    TILE_RAYS,
    tri_blocks_closest_pallas,
    tri_blocks_transmittance_pallas,
)

from scenes_fixtures import random_tri_field

CAM = st.Camera.create(position=(0, 0, -6.0), fov=1.0)


@pytest.fixture(scope="module")
def setup():
    scene = random_tri_field(1200).build(bvh_threshold=64)
    cfg = st.RenderConfig(width=64, height=64)
    o, d = camera_rays(CAM, cfg)
    perm, _ = pk.tile_permutation(64, 64, 32, 32)
    o_t = o[perm].reshape(-1, TILE_RAYS, 3)
    d_t = d[perm].reshape(-1, TILE_RAYS, 3)
    mats = scene.materials
    tri_m = scene.triangles.material
    factor = jnp.where(
        mats.emission[tri_m] > 0.0, 1.0, mats.transparency[tri_m]
    )
    packed, centers, half_ext = pk.block_pack(scene.triangles, factor)
    po, ro, axis, cos_g = pk.make_bundles(o_t, d_t)
    mask, near = pk.cull_blocks(po, ro, axis, cos_g, centers, half_ext)
    cand, valid, ovf = pk.candidate_leaves(mask, 16, near)
    assert not bool(ovf)
    counts = valid.sum(axis=-1).astype(jnp.int32)
    near_sorted = jnp.take_along_axis(near, cand, axis=-1)
    return packed, o_t, d_t, cand, counts, near_sorted


class TestClosest:
    def test_matches_xla_packet(self, setup):
        packed, o_t, d_t, cand, counts, near_sorted = setup
        t_x, i_x = pk.tri_blocks_closest(packed, o_t, d_t, cand, counts,
                                         1e-4)
        t_p, i_p = tri_blocks_closest_pallas(
            packed, o_t, d_t, cand, counts, near_sorted, 1e-4,
            interpret=True,
        )
        np.testing.assert_allclose(np.asarray(t_p), np.asarray(t_x),
                                   rtol=1e-6)
        hit = np.asarray(t_x) < 1e30
        np.testing.assert_array_equal(
            np.asarray(i_p)[hit], np.asarray(i_x)[hit]
        )

    def test_early_out_does_not_change_result(self, setup):
        """Early termination must be conservative: compare against a
        run where the near bounds are all zero (no skipping)."""
        packed, o_t, d_t, cand, counts, near_sorted = setup
        t_e, _ = tri_blocks_closest_pallas(
            packed, o_t, d_t, cand, counts, near_sorted, 1e-4,
            interpret=True,
        )
        t_n, _ = tri_blocks_closest_pallas(
            packed, o_t, d_t, cand, counts,
            jnp.zeros_like(near_sorted), 1e-4, interpret=True,
        )
        np.testing.assert_allclose(np.asarray(t_e), np.asarray(t_n),
                                   rtol=1e-6)


class TestTransmittance:
    def test_matches_xla_packet(self, setup):
        packed, o_t, d_t, cand, counts, near_sorted = setup
        t_max = jnp.full(o_t.shape[:2], 50.0, jnp.float32)
        tr_x = pk.tri_blocks_transmittance(
            packed, o_t, d_t, t_max, cand, counts, 1e-4
        )
        tr_p = tri_blocks_transmittance_pallas(
            packed, o_t, d_t, t_max, cand, counts, near_sorted, 1e-4,
            interpret=True,
        )
        np.testing.assert_allclose(np.asarray(tr_p), np.asarray(tr_x),
                                   rtol=1e-6)
