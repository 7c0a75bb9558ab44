"""Distributed code paths on 8 virtual CPU devices (SURVEY.md section 4
item 5): sharded render == single-device render; sharded grads == psum
of tile grads == single-device grads."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import solr_tpu as st
from solr_tpu.ops.render import render_sample
from solr_tpu.parallel import (
    make_mesh,
    make_sharded_train_step,
    shard_render,
    sharded_loss_grad,
)

from scenes_fixtures import cornell_box, cornell_camera

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)

CFG = st.RenderConfig(width=32, height=32, max_bounces=2)


@pytest.fixture(scope="module")
def scene():
    return cornell_box(n_spheres=4).build()


@pytest.fixture(scope="module")
def cam():
    return cornell_camera()


class TestShardRender:
    def test_matches_single_device(self, scene, cam):
        mesh = make_mesh(8)
        img_s, depth_s = jax.jit(
            lambda s, c: shard_render(s, c, CFG, mesh)
        )(scene, cam)
        img_1, depth_1 = jax.jit(
            render_sample, static_argnums=2
        )(scene, cam, CFG)
        np.testing.assert_allclose(
            np.asarray(img_s), np.asarray(img_1), atol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(depth_s), np.asarray(depth_1), atol=1e-4
        )

    def test_uneven_mesh_sizes(self, scene, cam):
        mesh = make_mesh(4)
        img_s, _ = shard_render(scene, cam, CFG, mesh)
        img_1, _ = render_sample(scene, cam, CFG)
        np.testing.assert_allclose(
            np.asarray(img_s), np.asarray(img_1), atol=1e-6
        )

    def test_indivisible_raises(self, scene, cam):
        mesh = make_mesh(8)
        cfg = st.RenderConfig(width=33, height=31)
        with pytest.raises(ValueError):
            shard_render(scene, cam, cfg, mesh)


class TestShardedGrads:
    def test_matches_single_device_grads(self, scene, cam):
        mesh = make_mesh(8)
        target, _ = render_sample(scene, cam, CFG)
        target = target[..., :3] * 0.7

        loss_d, grads_d = jax.jit(
            lambda s, c, t: sharded_loss_grad(s, c, CFG, t, mesh)
        )(scene, cam, target)

        def loss_fn(params):
            img, _ = render_sample(scene.with_params(params), cam, CFG)
            err = img[..., :3] - target
            return jnp.mean(err * err)

        loss_1, grads_1 = jax.value_and_grad(loss_fn)(scene.params)
        assert np.allclose(float(loss_d), float(loss_1), rtol=1e-5)

        def check(path, a, b):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6,
                err_msg=str(path),
            )

        jax.tree_util.tree_map_with_path(check, grads_d, grads_1)

    def test_train_step_reduces_loss(self, scene, cam):
        mesh = make_mesh(8)
        target, _ = render_sample(scene, cam, CFG)
        target = target[..., :3]

        import optax

        params = dict(scene.params)
        params["albedo"] = params["albedo"] + 0.1
        # Albedo-only recovery (geometry grads are shading-only; see
        # test_gradients.TestInverseRendering).
        # NB optax.masked passes unmasked grads through verbatim (they
        # would be ADDED by apply_updates) — use multi_transform+zero.
        opt_inner = optax.multi_transform(
            {"adam": optax.adam(1e-2), "zero": optax.set_to_zero()},
            {k: "adam" if k == "albedo" else "zero" for k in params},
        )
        step, opt = make_sharded_train_step(
            scene, cam, CFG, mesh, opt_inner
        )
        state = opt.init(params)
        params, state, l0 = step(params, state, target)
        for _ in range(40):
            params, state, l1 = step(params, state, target)
        assert float(l1) < 0.5 * float(l0)
