"""Packet (tile-frustum) traversal correctness: must agree exactly with
the per-ray while_loop walk and the brute-force sweep (the candidate
cull is conservative, so identical hits are required, not just close).
"""

import jax
import numpy as np
import pytest

import solr_tpu as st
from solr_tpu.oracle.cpu_tracer import oracle_render
from solr_tpu.ops import packet as pk
from solr_tpu.ops.render import render_sample

from scenes_fixtures import random_tri_field


def _render(scene, cam, cfg):
    img, t = jax.jit(render_sample, static_argnums=2)(scene, cam, cfg)
    return np.asarray(img), np.asarray(t)


@pytest.fixture(scope="module")
def tri_scene():
    return random_tri_field(1500).build(bvh_threshold=64)


CAM = st.Camera.create(position=(0, 0, -6.0), fov=1.0)


class TestTilePermutation:
    def test_roundtrip(self):
        perm, inv = pk.tile_permutation(64, 32, 16, 8)
        x = np.arange(64 * 32)
        assert (x[perm][inv] == x).all()

    def test_tiles_are_blocks(self):
        perm, _ = pk.tile_permutation(64, 64, 32, 32)
        first_tile = perm[: 32 * 32]
        rows = first_tile // 64
        cols = first_tile % 64
        assert rows.max() < 32 and cols.max() < 32


class TestPacketMatchesWhile:
    @pytest.mark.parametrize("bounces", [1, 3])
    def test_exact_match(self, tri_scene, bounces):
        base = dict(width=64, height=64, max_bounces=bounces)
        cfg_p = st.RenderConfig(
            **base, traversal="packet", packet_tile_w=16, packet_tile_h=16
        )
        cfg_w = st.RenderConfig(**base, traversal="while")
        img_p, t_p = _render(tri_scene, CAM, cfg_p)
        img_w, t_w = _render(tri_scene, CAM, cfg_w)
        np.testing.assert_allclose(img_p, img_w, atol=1e-6)
        np.testing.assert_allclose(t_p, t_w, rtol=1e-6)

    def test_no_overflow_at_default_cap(self):
        """A surface mesh seen at non-grazing angles must fit the default
        per-tile block cap; grazing/horizon tiles and volumetric soups may
        overflow, which degrades gracefully (nearest blocks are kept)."""
        from solr_tpu.ops.camera import camera_rays

        # Heightfield of ~31k tris = ~250 blocks.
        gw = 125
        xs = np.linspace(-8, 8, gw + 1, dtype=np.float32)
        zs = np.linspace(2, 18, gw + 1, dtype=np.float32)
        xg, zg = np.meshgrid(xs, zs)
        yg = np.sin(xg) * np.cos(zg) - 2.0
        verts = np.stack([xg, yg, zg], -1).reshape(-1, 3)
        idx = np.arange((gw + 1) ** 2).reshape(gw + 1, gw + 1)
        q00, q10 = idx[:-1, :-1].ravel(), idx[:-1, 1:].ravel()
        q01, q11 = idx[1:, :-1].ravel(), idx[1:, 1:].ravel()
        faces = np.concatenate([
            np.stack([q00, q10, q11], -1), np.stack([q00, q11, q01], -1)
        ])
        b = st.SceneBuilder()
        m = b.add_material(color=(0.5, 0.5, 0.5, 1.0))
        b.add_mesh(verts, faces, m)
        b.add_light((0, 5, 5))
        scene = b.build(bvh_threshold=64)
        cfg = st.RenderConfig(width=64, height=64, packet_tile_w=16,
                              packet_tile_h=16)
        cam = st.Camera.create(position=(0.0, 8.0, 10.0),
                               angles=(1.35, 0.0, 0.0), fov=1.0)
        o, d = camera_rays(cam, cfg)
        perm, _ = pk.tile_permutation(64, 64, 16, 16)
        o_t = o[perm].reshape(-1, 256, 3)
        d_t = d[perm].reshape(-1, 256, 3)
        _, centers, half_ext = pk.block_pack(scene.triangles)
        po, ro, axis, cos_g = pk.make_bundles(o_t, d_t)
        mask, _near = pk.cull_blocks(po, ro, axis, cos_g, centers, half_ext)
        counts = np.asarray(mask.sum(axis=-1))
        assert counts.max() <= cfg.packet_max_blocks
        # The cull must actually cull (tight cones on primary rays).
        assert counts.mean() < 0.6 * centers.shape[0]

    def test_vs_oracle(self, tri_scene):
        cfg = st.RenderConfig(width=32, height=32, max_bounces=2,
                              traversal="packet", packet_tile_w=16,
                              packet_tile_h=16)
        img, _ = _render(tri_scene, CAM, cfg)
        ref = np.asarray(oracle_render(tri_scene, CAM, cfg))
        err = np.abs(img[..., :3] - ref[..., :3]).max(axis=-1)
        inlier = err <= 2e-2
        assert (1 - inlier.mean()) < 0.01
        assert err[inlier].mean() < 2e-3

    def test_gradients_through_packet(self, tri_scene):
        import jax.numpy as jnp

        cfg = st.RenderConfig(width=32, height=32, max_bounces=2,
                              traversal="packet", packet_tile_w=16,
                              packet_tile_h=16)

        def loss(params):
            img, _ = render_sample(tri_scene.with_params(params), CAM, cfg)
            return jnp.mean(img[..., :3] ** 2)

        g = jax.jit(jax.grad(loss))(tri_scene.params)
        for leaf in jax.tree_util.tree_leaves(g):
            assert np.isfinite(np.asarray(leaf)).all()
        assert sum(float(np.abs(np.asarray(x)).sum())
                   for x in g["vertices"]) > 0
