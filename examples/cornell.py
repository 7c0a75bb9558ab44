"""End-to-end TPU verification render: Cornell-style box with mirror,
glass, checkerboard floor, and a triangle mesh — exercises every pool,
the block-packet Pallas traversal, Phong+shadows, reflection/refraction,
and writes a PNG for visual inspection.

Run: PYTHONPATH=/root/repo:$PYTHONPATH python examples/cornell.py
"""

import sys
import time

import jax
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/solr_jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

import solr_tpu as st  # noqa: E402
from solr_tpu.io.image import save_image  # noqa: E402
from solr_tpu.scenes import make_scene  # noqa: E402


def main(out="/tmp/cornell_verify.png"):
    demo = make_scene("cornell").initialize()
    scene, camera = demo.scene, demo.camera
    cfg = st.RenderConfig(width=256, height=256, max_bounces=4)
    t0 = time.time()
    img = jax.jit(st.render, static_argnames=("cfg",))(scene, camera, cfg)
    img = np.asarray(img)
    dt = time.time() - t0
    assert np.isfinite(img).all(), "non-finite pixels"
    assert img[..., :3].max() > 0.05, "black frame"
    save_image(out, img[..., :3])
    print(f"device={jax.devices()[0]} render+compile={dt:.1f}s -> {out}")
    print(f"mean rgb={img[..., :3].mean(axis=(0, 1))}")


if __name__ == "__main__":
    main(*sys.argv[1:])
