"""Pallas sweep kernels vs the XLA block path, in interpret mode
(SURVEY.md section 5: interpret mode is the kernel "sanitizer").  The
SAME kernels are additionally compiled and run on real hardware by
tests/test_tpu_smoke.py — round 2 proved interpret-green != TPU-green,
so CPU interpret coverage alone is no longer the gate."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import solr_tpu as st
from solr_tpu.ops import packet as pk
from solr_tpu.ops.camera import camera_rays
from solr_tpu.ops.pallas_kernels import (
    make_rays16t,
    sweep_closest,
    sweep_transmittance,
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
    cand, counts, near_sorted, near_bound, dropped, _dsup = \
        pk.two_level_select(
        mask1, near1, accel.block_bounds,
        lambda bbg: pk.cull_blocks_g(po, ro, axis, cos_g, bbg), 8, K,
    )
    return accel, o_t, d_t, cand, counts, near_bound


class TestClosest:
    def test_matches_xla_packet(self, setup):
        accel, o_t, d_t, cand, counts, near_bound = setup
        t_x, i_x = pk.tri_blocks_closest(
            accel.packed, o_t, d_t, cand, counts, 1e-4
        )
        rays_t = make_rays16t(o_t, d_t)
        t_p, i_p, nv = sweep_closest(
            accel.packed, rays_t, cand, counts, near_bound, 1e-4,
            interpret=True,
        )
        np.testing.assert_allclose(np.asarray(t_p), np.asarray(t_x),
                                   rtol=1e-6)
        hit = np.asarray(t_x) < 1e30
        np.testing.assert_array_equal(
            np.asarray(i_p)[hit], np.asarray(i_x)[hit]
        )
        # Early-out must have skipped something on this front-to-back
        # workload, and never visited more than the candidate count.
        nv = np.asarray(nv)
        assert (nv <= np.asarray(counts)).all()

    def test_early_out_does_not_change_result(self, setup):
        """Early termination must be conservative: compare against a run
        where the near bounds are all zero (no skipping possible)."""
        accel, o_t, d_t, cand, counts, near_bound = setup
        rays_t = make_rays16t(o_t, d_t)
        t_e, _, _ = sweep_closest(
            accel.packed, rays_t, cand, counts, near_bound, 1e-4,
            interpret=True,
        )
        t_n, _, _ = sweep_closest(
            accel.packed, rays_t, cand, counts,
            jnp.zeros_like(near_bound), 1e-4, interpret=True,
        )
        np.testing.assert_allclose(np.asarray(t_e), np.asarray(t_n),
                                   rtol=1e-6)

    def test_chunked_matches_unchunked(self, setup):
        """The lax.map tile chunking (SMEM guard) must be invisible."""
        accel, o_t, d_t, cand, counts, near_bound = setup
        rays_t = make_rays16t(o_t, d_t)
        t_1, i_1, _ = sweep_closest(
            accel.packed, rays_t, cand, counts, near_bound, 1e-4,
            interpret=True,
        )
        t_c, i_c, _ = sweep_closest(
            accel.packed, rays_t, cand, counts, near_bound, 1e-4,
            interpret=True, chunk=3,  # forces padding + 6 chunks of 16
        )
        np.testing.assert_allclose(np.asarray(t_c), np.asarray(t_1),
                                   rtol=1e-6)
        np.testing.assert_array_equal(np.asarray(i_c), np.asarray(i_1))

    def test_parked_rays_excluded_from_cutoff(self, setup):
        """A tile of parked rays (live=0) must not stall the early-out:
        live flags come from rays_t row 9."""
        accel, o_t, d_t, cand, counts, near_bound = setup
        live = jnp.zeros(o_t.shape[:2], jnp.float32)  # all parked
        rays_t = make_rays16t(o_t, d_t, live_t=live)
        t_p, i_p, nv = sweep_closest(
            accel.packed, rays_t, cand, counts, near_bound, 1e-4,
            interpret=True,
        )
        # cutoff = max over live = 0 -> every candidate skipped.
        assert int(np.asarray(nv).sum()) == 0
        assert (np.asarray(i_p) == -1).all()


class TestSphereSweep:
    """Sphere-pool sweep (PDB molecule path) vs the XLA block path."""

    @pytest.fixture(scope="class")
    def sph_setup(self):
        from scenes_fixtures import random_sphere_field

        scene = random_sphere_field(900).build(bvh_threshold=64)
        accel = scene.sph_accel
        assert accel is not None
        cfg = st.RenderConfig(width=64, height=64)
        o, d = camera_rays(CAM, cfg)
        perm, _ = pk.tile_permutation(64, 64, 16, 16)
        o_t = o[perm].reshape(-1, SB, 3).astype(jnp.float32)
        d_t = d[perm].reshape(-1, SB, 3).astype(jnp.float32)
        po, ro, axis, cos_g = pk.make_bundles(o_t, d_t)
        mask1, near1 = pk.cull_blocks(
            po, ro, axis, cos_g,
            accel.sb_bounds[:, 0:3], accel.sb_bounds[:, 3:6],
        )
        cand, counts, _ns, near_bound, _d, _ds = pk.two_level_select(
            mask1, near1, accel.block_bounds,
            lambda bbg: pk.cull_blocks_g(po, ro, axis, cos_g, bbg), 8, K,
        )
        return accel, o_t, d_t, cand, counts, near_bound

    def test_closest_matches_xla(self, sph_setup):
        accel, o_t, d_t, cand, counts, near_bound = sph_setup
        t_x, i_x = pk.tri_blocks_closest(
            accel.packed, o_t, d_t, cand, counts, 1e-4, prim="sphere"
        )
        rays_t = make_rays16t(o_t, d_t)
        t_p, i_p, _ = sweep_closest(
            accel.packed, rays_t, cand, counts, near_bound, 1e-4,
            interpret=True, prim="sphere",
        )
        t_x, t_p = np.asarray(t_x), np.asarray(t_p)
        hit = t_x < 1e30
        assert hit.any()
        np.testing.assert_allclose(t_p[hit], t_x[hit], rtol=1e-6)
        np.testing.assert_array_equal(
            np.asarray(i_p)[hit], np.asarray(i_x)[hit]
        )

    def test_transmittance_matches_xla(self, sph_setup):
        accel, o_t, d_t, cand, counts, near_bound = sph_setup
        t_max = jnp.full(o_t.shape[:2], 40.0, jnp.float32)
        tr_x = pk.tri_blocks_transmittance(
            accel.packed, o_t, d_t, t_max, cand, counts, 1e-4,
            prim="sphere",
        )
        rays_t = make_rays16t(o_t, d_t, tmax_t=t_max)
        tr_p, _ = sweep_transmittance(
            accel.packed, rays_t, cand, counts, 1e-4, interpret=True,
            prim="sphere",
        )
        np.testing.assert_allclose(np.asarray(tr_p), np.asarray(tr_x),
                                   atol=1e-6)

    def test_sphere_blocks_match_bruteforce(self, sph_setup):
        """The sphere block test (XLA form) vs isect.sphere_t over every
        sphere — pins the packed layout + intersection math."""
        from solr_tpu.ops import intersect as isect
        from scenes_fixtures import random_sphere_field

        scene = random_sphere_field(900).build(bvh_threshold=64)
        accel, o_t, d_t, _c, _n, _nb = sph_setup
        nb = accel.packed.shape[0]
        allcand = jnp.broadcast_to(
            jnp.arange(nb, dtype=jnp.int32)[None], (o_t.shape[0], nb)
        )
        counts = jnp.full((o_t.shape[0],), nb, jnp.int32)
        t_blk, i_blk = pk.tri_blocks_closest(
            accel.packed, o_t, d_t, allcand, counts, 1e-4, prim="sphere"
        )
        o_f = o_t.reshape(-1, 3)
        d_f = d_t.reshape(-1, 3)
        t_ref = isect.sphere_t(
            o_f, d_f, scene.spheres.center, scene.spheres.radius, 1e-4
        ).min(axis=-1)
        # rtol 5e-4: f32 accumulation-order noise between the block
        # form and isect.sphere_t; hit SELECTION is what matters (the
        # renderer recomputes exact t for the winner — traverse.
        # _recompute_t).
        np.testing.assert_allclose(
            np.asarray(t_blk).reshape(-1), np.asarray(t_ref), rtol=5e-4
        )


class TestTransmittance:
    def test_matches_xla_packet(self, setup):
        accel, o_t, d_t, cand, counts, near_bound = setup
        t_max = jnp.full(o_t.shape[:2], 50.0, jnp.float32)
        tr_x = pk.tri_blocks_transmittance(
            accel.packed, o_t, d_t, t_max, cand, counts, 1e-4
        )
        rays_t = make_rays16t(o_t, d_t, tmax_t=t_max)
        tr_p, _ = sweep_transmittance(
            accel.packed, rays_t, cand, counts, 1e-4, interpret=True
        )
        np.testing.assert_allclose(np.asarray(tr_p), np.asarray(tr_x),
                                   rtol=1e-6)


class TestSubBundleMasking:
    """Sub-bundle masking (round-4 compute lever) must be invisible in
    results: the per-sub-bundle cull is conservative, so the masked
    sweep returns bit-identical hits/transmittance vs the whole-tile
    sweep, while skipping work for strips that cannot hit a block."""

    def test_closest_matches_unmasked(self, setup):
        accel, o_t, d_t, cand, counts, near_bound = setup
        live = jnp.ones(o_t.shape[:2], bool)
        g = 8
        bits = pk.subbundle_bits(
            o_t, d_t, live, cand, accel.block_bounds, g
        )
        rays_t = make_rays16t(o_t, d_t)
        t_m, i_m, _ = sweep_closest(
            accel.packed, rays_t, cand, counts, near_bound, 1e-4,
            interpret=True, submask=bits, sub_g=g,
        )
        t_u, i_u, _ = sweep_closest(
            accel.packed, rays_t, cand, counts, near_bound, 1e-4,
            interpret=True,
        )
        np.testing.assert_allclose(np.asarray(t_m), np.asarray(t_u),
                                   rtol=1e-6)
        hit = np.asarray(t_u) < 1e30
        np.testing.assert_array_equal(
            np.asarray(i_m)[hit], np.asarray(i_u)[hit]
        )
        # The mask must actually clear some bits on this workload.
        full = (1 << g) - 1
        assert (np.asarray(bits) != full).any()

    def test_transmittance_matches_unmasked(self, setup):
        accel, o_t, d_t, cand, counts, near_bound = setup
        t_max = jnp.full(o_t.shape[:2], 50.0, jnp.float32)
        live = jnp.ones(o_t.shape[:2], bool)
        g = 8
        bits = pk.subbundle_bits_capsule(
            o_t, d_t, t_max, live, cand, accel.block_bounds, g
        )
        rays_t = make_rays16t(o_t, d_t, tmax_t=t_max)
        tr_m, _ = sweep_transmittance(
            accel.packed, rays_t, cand, counts, 1e-4, interpret=True,
            submask=bits, sub_g=g,
        )
        tr_u, _ = sweep_transmittance(
            accel.packed, rays_t, cand, counts, 1e-4, interpret=True,
        )
        np.testing.assert_allclose(np.asarray(tr_m), np.asarray(tr_u),
                                   rtol=1e-6)

    def test_bits_conservative_vs_bruteforce(self, setup):
        """Every real hit must come from a block whose sub-bundle bit
        is set: intersect every candidate block with every ray and
        check hits only occur where the bit allows them."""
        accel, o_t, d_t, cand, counts, near_bound = setup
        live = jnp.ones(o_t.shape[:2], bool)
        g = 8
        ssb = o_t.shape[1] // g
        bits = np.asarray(pk.subbundle_bits(
            o_t, d_t, live, cand, accel.block_bounds, g
        ))
        counts_np = np.asarray(counts)
        s_check = min(8, o_t.shape[0])
        for s in range(s_check):
            for k in range(int(counts_np[s])):
                w = accel.packed[cand[s, k]][None]
                t = pk._woop_t(o_t[s:s + 1], d_t[s:s + 1], w, 1e-4)
                t = np.asarray(t)[0]  # (SB, BLOCK)
                hit_sub = (t < 1e30).any(axis=1).reshape(g, ssb).any(1)
                allowed = (bits[s, k] >> np.arange(g)) & 1
                assert not (hit_sub & (allowed == 0)).any()


class TestCylinderSweep:
    """Cylinder-pool sweep (PDB sticks / SWC neurite path): Pallas vs
    XLA block path vs per-cylinder brute force."""

    @pytest.fixture(scope="class")
    def cyl_setup(self):
        from scenes_fixtures import random_cylinder_field

        scene = random_cylinder_field(700).build(bvh_threshold=64)
        accel = scene.cyl_accel
        assert accel is not None
        cfg = st.RenderConfig(width=64, height=64)
        o, d = camera_rays(CAM, cfg)
        perm, _ = pk.tile_permutation(64, 64, 16, 16)
        o_t = o[perm].reshape(-1, SB, 3).astype(jnp.float32)
        d_t = d[perm].reshape(-1, SB, 3).astype(jnp.float32)
        po, ro, axis, cos_g = pk.make_bundles(o_t, d_t)
        mask1, near1 = pk.cull_blocks(
            po, ro, axis, cos_g,
            accel.sb_bounds[:, 0:3], accel.sb_bounds[:, 3:6],
        )
        cand, counts, _ns, near_bound, _d, _ds = pk.two_level_select(
            mask1, near1, accel.block_bounds,
            lambda bbg: pk.cull_blocks_g(po, ro, axis, cos_g, bbg), 8, K,
        )
        return scene, accel, o_t, d_t, cand, counts, near_bound

    def test_closest_matches_xla(self, cyl_setup):
        scene, accel, o_t, d_t, cand, counts, near_bound = cyl_setup
        t_x, i_x = pk.tri_blocks_closest(
            accel.packed, o_t, d_t, cand, counts, 1e-4, prim="cyl"
        )
        rays_t = make_rays16t(o_t, d_t)
        t_p, i_p, _ = sweep_closest(
            accel.packed, rays_t, cand, counts, near_bound, 1e-4,
            interpret=True, prim="cyl",
        )
        t_x, t_p = np.asarray(t_x), np.asarray(t_p)
        hit = t_x < 1e30
        assert hit.any()
        np.testing.assert_allclose(t_p[hit], t_x[hit], rtol=1e-6)
        np.testing.assert_array_equal(
            np.asarray(i_p)[hit], np.asarray(i_x)[hit]
        )

    def test_blocks_match_bruteforce(self, cyl_setup):
        """All-candidate block sweep vs isect.cylinder_t over the whole
        pool — pins the packed layout + capped-cylinder math."""
        from solr_tpu.ops import intersect as isect

        scene, accel, o_t, d_t, _c, _n, _nb = cyl_setup
        nb = accel.packed.shape[0]
        allcand = jnp.broadcast_to(
            jnp.arange(nb, dtype=jnp.int32)[None], (o_t.shape[0], nb)
        )
        counts = jnp.full((o_t.shape[0],), nb, jnp.int32)
        t_blk, _ = pk.tri_blocks_closest(
            accel.packed, o_t, d_t, allcand, counts, 1e-4, prim="cyl"
        )
        o_f = o_t.reshape(-1, 3)
        d_f = d_t.reshape(-1, 3)
        t_ref = isect.cylinder_t(
            o_f, d_f, scene.cylinders.p0, scene.cylinders.p1,
            scene.cylinders.radius, 1e-4,
        ).min(axis=-1)
        t_blk = np.asarray(t_blk).reshape(-1)
        t_ref = np.asarray(t_ref)
        # Grazing rays can flip hit/miss between the two f32 evaluation
        # orders (disc ~ 0); require > 99.9% agreement and tight t
        # equality on agreeing hits.
        hit_b = t_blk < 1e30
        hit_r = t_ref < 1e30
        assert (hit_b == hit_r).mean() > 0.999
        both = hit_b & hit_r
        np.testing.assert_allclose(t_blk[both], t_ref[both], rtol=5e-4)

    def test_transmittance_matches_xla(self, cyl_setup):
        scene, accel, o_t, d_t, cand, counts, near_bound = cyl_setup
        t_max = jnp.full(o_t.shape[:2], 40.0, jnp.float32)
        tr_x = pk.tri_blocks_transmittance(
            accel.packed, o_t, d_t, t_max, cand, counts, 1e-4, prim="cyl"
        )
        rays_t = make_rays16t(o_t, d_t, tmax_t=t_max)
        tr_p, _ = sweep_transmittance(
            accel.packed, rays_t, cand, counts, 1e-4, interpret=True,
            prim="cyl",
        )
        np.testing.assert_allclose(np.asarray(tr_p), np.asarray(tr_x),
                                   atol=1e-6)

    def test_render_uses_cyl_packet(self):
        """End-to-end: a big cylinder field renders identically with the
        packet path and the reference-semantics while walk."""
        from scenes_fixtures import random_cylinder_field

        scene = random_cylinder_field(300).build(bvh_threshold=64)
        cfg_p = st.RenderConfig(width=32, height=32, max_bounces=2,
                                traversal="packet", packet_tile_w=16,
                                packet_tile_h=16)
        cfg_w = st.RenderConfig(width=32, height=32, max_bounces=2,
                                traversal="while")
        from solr_tpu.ops.render import render_sample

        img_p, _ = render_sample(scene, CAM, cfg_p)
        img_w, _ = render_sample(scene, CAM, cfg_w)
        np.testing.assert_allclose(np.asarray(img_p), np.asarray(img_w),
                                   atol=1e-6)
