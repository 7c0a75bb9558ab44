"""Headline benchmark: rays/s/chip, primary+secondary, on a BVH triangle
scene (BASELINE.json north-star: >= 1 Grays/s/chip on 1M tris).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Ray accounting (matches the north-star's "primary + secondary
(reflection/refraction/shadow) rays"): every bounce traces 1 closest-hit
ray per pixel plus 1 shadow ray per light per pixel, so
    rays/frame = n_pixels * max_bounces * (1 + n_lights).
This is the work the kernel actually performs (dead rays still occupy
lanes until compaction lands), identical to how the reference's per-pixel
loop counts (SURVEY.md section 3.3).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

N_TRIS = int(os.environ.get("SOLR_BENCH_TRIS", 1_000_000))
WIDTH = int(os.environ.get("SOLR_BENCH_WIDTH", 512))
HEIGHT = int(os.environ.get("SOLR_BENCH_HEIGHT", 512))
BOUNCES = int(os.environ.get("SOLR_BENCH_BOUNCES", 2))
REPEATS = int(os.environ.get("SOLR_BENCH_REPEATS", 3))
BASELINE_RAYS_PER_S = 1.0e9  # north-star: 1 Grays/s/chip


def build_scene():
    import numpy as np
    import solr_tpu as st

    rng = np.random.default_rng(42)
    b = st.SceneBuilder()
    m = b.add_material(color=(0.7, 0.6, 0.5, 1.0), specular=0.3)
    mirror = b.add_material(color=(0.9, 0.9, 0.9, 1.0), reflection=0.5)

    # Triangle cloud: N_TRIS small triangles filling a slab the camera
    # fully covers, so every pixel's traversal does real work.
    extent = 40.0
    c = rng.uniform(-extent, extent, (N_TRIS, 3)).astype(np.float32)
    c[:, 2] = rng.uniform(20.0, 60.0, N_TRIS)
    d1 = rng.normal(0, 0.25, (N_TRIS, 3)).astype(np.float32)
    d2 = rng.normal(0, 0.25, (N_TRIS, 3)).astype(np.float32)
    mats = np.where(rng.uniform(size=N_TRIS) < 0.3, mirror, m)
    b.add_triangles_raw(c, c + d1, c + d2, mats)
    b.add_light((0.0, extent * 1.5, 0.0), intensity=1.0)
    scene = b.build(bvh_threshold=64)
    cam = st.Camera.create(position=(0.0, 0.0, -10.0), fov=1.0)
    cfg = st.RenderConfig(width=WIDTH, height=HEIGHT, max_bounces=BOUNCES)
    return scene, cam, cfg


def _run(n_tris):
    """Returns the result dict, or raises on device failure."""
    global N_TRIS
    N_TRIS = n_tris

    import jax
    import jax.numpy as jnp
    import numpy as np

    from solr_tpu.ops.render import render_sample

    t0 = time.time()
    scene, cam, cfg = build_scene()
    build_s = time.time() - t0

    # Digest to a scalar on-device: forces the full render but keeps the
    # host transfer tiny.  NB block_until_ready does NOT reliably block
    # under tunneled backends — np.asarray of the digest is the honest
    # synchronization.
    def frame(scene, cam):
        img, _ = render_sample(scene, cam, cfg)
        return jnp.sum(img)

    fn = jax.jit(frame)
    t0 = time.time()
    digest = float(np.asarray(fn(scene, cam)))
    compile_s = time.time() - t0
    assert np.isfinite(digest)

    best = float("inf")
    for _ in range(REPEATS):
        t0 = time.time()
        float(np.asarray(fn(scene, cam)))
        best = min(best, time.time() - t0)

    n_lights = scene.lights.position.shape[0]
    rays = cfg.n_pixels * cfg.max_bounces * (1 + n_lights)
    rays_per_s = rays / best
    return {
        "metric": (
            f"rays/s/chip primary+secondary, {n_tris} tris, "
            f"{WIDTH}x{HEIGHT}x{BOUNCES}b BVH"
        ),
        "value": round(rays_per_s, 1),
        "unit": "rays/s",
        "vs_baseline": round(rays_per_s / BASELINE_RAYS_PER_S, 6),
        "frame_ms": round(best * 1000, 2),
        "compile_s": round(compile_s, 1),
        "scene_build_s": round(build_s, 1),
        "device": str(__import__("jax").devices()[0]),
    }


def main():
    sizes = [N_TRIS, N_TRIS // 5, N_TRIS // 20]
    last_err = None
    for n in sizes:
        try:
            result = _run(n)
            break
        except Exception as e:  # device fault at this scale: shrink
            last_err = e
            result = None
    if result is None:
        result = {
            "metric": "bench failed at all scales",
            "value": 0.0,
            "unit": "rays/s",
            "vs_baseline": 0.0,
            "error": str(last_err)[:200],
        }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
