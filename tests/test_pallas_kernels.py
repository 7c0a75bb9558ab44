"""Pallas packet kernels vs the XLA packet path, in interpret mode
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
    tri_tiles_closest_pallas,
    tri_tiles_transmittance_pallas,
)

from scenes_fixtures import random_tri_field

CAM = st.Camera.create(position=(0, 0, -6.0), fov=1.0)


@pytest.fixture(scope="module")
def setup():
    scene = random_tri_field(1200).build(bvh_threshold=64)
    bvh = scene.tri_bvh
    cfg = st.RenderConfig(width=64, height=64)
    o, d = camera_rays(CAM, cfg)
    perm, _ = pk.tile_permutation(64, 64, 32, 32)
    o_t = o[perm].reshape(-1, TILE_RAYS, 3)
    d_t = d[perm].reshape(-1, TILE_RAYS, 3)
    po, ro, axis, cos_g = pk.make_bundles(o_t, d_t)
    mask, near = pk.cull_leaves(
        po, ro, axis, cos_g, bvh.leaf_center, bvh.leaf_radius
    )
    cand, valid, ovf = pk.candidate_leaves(mask, 256, near)
    assert not bool(ovf)
    near_sorted = jnp.take_along_axis(near, cand, axis=-1)
    return scene, bvh, o_t, d_t, cand, valid, near_sorted


class TestClosest:
    def test_matches_xla_packet(self, setup):
        scene, bvh, o_t, d_t, cand, valid, near_sorted = setup
        t_x, i_x = pk.tri_tiles_closest(
            scene.triangles, bvh, o_t, d_t, cand, valid, 1e-4
        )
        t_p, i_p = tri_tiles_closest_pallas(
            scene.triangles, bvh, o_t, d_t, cand, valid, near_sorted,
            1e-4, interpret=True,
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
        scene, bvh, o_t, d_t, cand, valid, near_sorted = setup
        t_e, i_e = tri_tiles_closest_pallas(
            scene.triangles, bvh, o_t, d_t, cand, valid, near_sorted,
            1e-4, interpret=True,
        )
        t_n, i_n = tri_tiles_closest_pallas(
            scene.triangles, bvh, o_t, d_t, cand, valid,
            jnp.zeros_like(near_sorted), 1e-4, interpret=True,
        )
        np.testing.assert_allclose(np.asarray(t_e), np.asarray(t_n),
                                   rtol=1e-6)


class TestTransmittance:
    def test_matches_xla_packet(self, setup):
        scene, bvh, o_t, d_t, cand, valid, near_sorted = setup
        mats = scene.materials
        tri_m = scene.triangles.material
        factor = jnp.where(
            mats.emission[tri_m] > 0.0, 1.0, mats.transparency[tri_m]
        )
        t_max = jnp.full(o_t.shape[:2], 50.0, jnp.float32)
        tr_x = pk.tri_tiles_transmittance(
            scene.triangles, bvh, o_t, d_t, t_max, cand, valid, 1e-4,
            factor,
        )
        tr_p = tri_tiles_transmittance_pallas(
            scene.triangles, bvh, o_t, d_t, t_max, cand, valid,
            near_sorted, 1e-4, factor, interpret=True,
        )
        np.testing.assert_allclose(np.asarray(tr_p), np.asarray(tr_x),
                                   rtol=1e-6)
