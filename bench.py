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

import jax

# Remote (tunneled) TPU compiles run 3-8 min; the persistent cache makes
# repeat benches start in seconds.
jax.config.update("jax_compilation_cache_dir", "/tmp/solr_jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

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
    terrain = b.add_material(color=(0.55, 0.5, 0.4, 1.0), specular=0.2)
    mirror = b.add_material(color=(0.9, 0.9, 0.9, 1.0), reflection=0.6,
                            specular=0.8)

    # Tessellated terrain heightfield of ~N_TRIS triangles: a realistic
    # high-poly surface (every pixel hits geometry; traversal touches a
    # localized leaf set, unlike a volumetric triangle soup).
    gw = int(np.sqrt(N_TRIS / 2.0))
    gh = max(N_TRIS // (2 * gw), 1)
    extent = 40.0
    xs = np.linspace(-extent, extent, gw + 1, dtype=np.float32)
    zs = np.linspace(5.0, 5.0 + 2 * extent, gh + 1, dtype=np.float32)
    xg, zg = np.meshgrid(xs, zs)
    yg = (
        2.0 * np.sin(xg * 0.25) * np.cos(zg * 0.25)
        + 0.7 * np.sin(xg * 1.1 + 2.0) * np.cos(zg * 0.9)
        + 0.25 * np.sin(xg * 3.7) * np.sin(zg * 4.1)
        - 4.0
    ).astype(np.float32)
    verts = np.stack([xg, yg, zg], axis=-1).reshape(-1, 3)
    idx = np.arange((gh + 1) * (gw + 1)).reshape(gh + 1, gw + 1)
    q00 = idx[:-1, :-1].reshape(-1)
    q10 = idx[:-1, 1:].reshape(-1)
    q01 = idx[1:, :-1].reshape(-1)
    q11 = idx[1:, 1:].reshape(-1)
    faces = np.concatenate(
        [
            np.stack([q00, q10, q11], axis=-1),
            np.stack([q00, q11, q01], axis=-1),
        ]
    )
    b.add_mesh(verts, faces, terrain)

    # Mirror spheres scattered on the terrain: secondary-ray workload.
    for i in range(24):
        x = rng.uniform(-extent * 0.8, extent * 0.8)
        z = rng.uniform(10.0, 5.0 + 1.8 * extent)
        b.add_sphere((x, -1.5, z), rng.uniform(0.8, 2.0), mirror)
    b.add_light((0.0, extent, 10.0), intensity=1.0)
    scene = b.build(bvh_threshold=64)
    cam = st.Camera.create(
        position=(0.0, 2.0, -4.0), angles=(0.25, 0.0, 0.0), fov=1.0
    )
    cfg = st.RenderConfig(
        width=WIDTH, height=HEIGHT, max_bounces=BOUNCES,
        gradient_background=True,
        packet_tile_w=int(os.environ.get("SOLR_BENCH_TILE_W", 16)),
        packet_tile_h=int(os.environ.get("SOLR_BENCH_TILE_H", 16)),
        packet_max_blocks=int(os.environ.get("SOLR_BENCH_K", 16)),
        packet_max_super=int(os.environ.get("SOLR_BENCH_M", 12)),
    )
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
