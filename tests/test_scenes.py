"""Demo-scene gallery smoke tests: every registered scene builds and
renders finite, non-flat images (the reference's de-facto integration
corpus, SURVEY.md section 4)."""

import numpy as np
import pytest

import solr_tpu as st
from solr_tpu.ops.render import render_sample
from solr_tpu.scenes import SCENE_REGISTRY, make_scene

CFG = st.RenderConfig(width=24, height=24, max_bounces=2)


@pytest.mark.parametrize("name", sorted(SCENE_REGISTRY))
def test_scene_renders(name):
    demo = make_scene(name, seed=1)
    img, _ = render_sample(demo.scene, demo.camera, CFG)
    arr = np.asarray(img)
    assert np.isfinite(arr).all(), f"{name}: non-finite pixels"
    assert arr[..., :3].std() > 1e-3, f"{name}: flat image"


def test_animate_produces_distinct_frames():
    demo = make_scene("cubes", seed=1)
    s0, c0 = demo.animate(0)
    s5, c5 = demo.animate(5)
    i0, _ = render_sample(s0, c0, CFG)
    i5, _ = render_sample(s5, c5, CFG)
    assert float(np.abs(np.asarray(i0) - np.asarray(i5)).max()) > 1e-3


def test_viewer_cli(tmp_path):
    from solr_tpu.viewer import main

    out = str(tmp_path / "out.png")
    main(["--scene", "cornell", "--out", out, "--width", "32",
          "--height", "32", "--bounces", "1"])
    from solr_tpu.io import load_image

    img = load_image(out)
    assert img.shape == (32, 32, 4)


def test_viewer_list(capsys):
    from solr_tpu.viewer import main

    main(["--list"])
    out = capsys.readouterr().out
    assert "cornell" in out and "water" in out
