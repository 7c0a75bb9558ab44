"""Component-level profile of the packet traversal hot path on the real
chip.  Times (a) block_pack, (b) bundle cull + top_k, (c) the Pallas
closest-hit kernel, (d) a full closest-hit traversal, (e) a full shadow
traversal, (f) the whole frame — so perf work targets the true bottleneck.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/solr_jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

import jax.numpy as jnp
import numpy as np

import bench as bench_mod


def timeit(fn, *args, reps=3):
    out = fn(*args)
    jax.block_until_ready(out)
    # tunneled backend: force a tiny host transfer as the honest sync
    sync = lambda o: np.asarray(jax.tree_util.tree_leaves(o)[0]).ravel()[:1]
    sync(out)
    best = float("inf")
    for _ in range(reps):
        t0 = time.time()
        out = fn(*args)
        sync(out)
        best = min(best, time.time() - t0)
    return best * 1000


def main():
    from solr_tpu.ops import packet as pk
    from solr_tpu.ops.render import render_sample
    from solr_tpu.ops.traverse import (
        _tri_packet_closest, _tri_packet_transmittance)
    from solr_tpu.ops.camera import camera_rays
    from solr_tpu.ops.packet import tile_permutation

    scene, cam, cfg = bench_mod.build_scene()
    print("tris:", scene.triangles.v0.shape[0], "BLOCK:", pk.BLOCK,
          "tile:", cfg.packet_rays, "K:", cfg.packet_max_blocks)

    o, d = camera_rays(cam, cfg, None, jnp.float32)
    perm, inv = tile_permutation(cfg.width, cfg.height,
                                 cfg.packet_tile_w, cfg.packet_tile_h)
    o, d = o[perm], d[perm]
    spec = cfg.packet_spec()
    tile_rays, max_blocks = spec[0], spec[1]

    # (a) block_pack
    bp = jax.jit(lambda tris: pk.block_pack(tris))
    t = timeit(bp, scene.triangles)
    print(f"block_pack:            {t:8.2f} ms")
    packed, centers, half_ext = jax.block_until_ready(bp(scene.triangles))
    print("  blocks:", packed.shape[0])

    # (b) bundles + cull + top_k
    def cull(o, d):
        o_t = o.reshape(-1, tile_rays, 3)
        d_t = d.reshape(-1, tile_rays, 3)
        po, ro, axis, cos_g = pk.make_bundles(o_t, d_t)
        mask, near = pk.cull_blocks(po, ro, axis, cos_g, centers, half_ext)
        cand, valid, ovf = pk.candidate_leaves(mask, max_blocks, near)
        return cand, valid.sum(axis=-1).astype(jnp.int32), mask.sum(), near

    cullj = jax.jit(cull)
    t = timeit(cullj, o, d)
    cand, counts, tot, near = jax.block_until_ready(cullj(o, d))
    cnp = np.asarray(counts)
    print(f"cull+topk (primary):   {t:8.2f} ms   "
          f"cand/tile mean {cnp.mean():.1f} max {cnp.max()} "
          f"mask_total {int(np.asarray(tot))}")

    # (c) pallas kernel alone, primary rays
    from solr_tpu.ops.pallas_kernels import tri_blocks_closest_pallas

    def kern(packed, o, d, cand, counts, near):
        o_t = o.reshape(-1, tile_rays, 3)
        d_t = d.reshape(-1, tile_rays, 3)
        near_sorted = jnp.take_along_axis(near, cand, axis=-1)
        return tri_blocks_closest_pallas(
            packed, o_t, d_t, cand, counts, near_sorted, 1e-3)

    kj = jax.jit(kern)
    t = timeit(kj, packed, o, d, cand, counts, near)
    print(f"pallas closest:        {t:8.2f} ms")

    # (d) full closest traversal (pack + cull + kernel)
    cj = jax.jit(lambda s, o, d: _tri_packet_closest(s, o, d, 1e-3, spec))
    t = timeit(cj, scene, o, d)
    print(f"closest traversal:     {t:8.2f} ms")

    # (e) shadow traversal from primary hits
    bt, bi = jax.block_until_ready(kj(packed, o, d, cand, counts, near))

    def shadow(s, o, d, bt):
        hitp = o + jnp.minimum(bt.reshape(-1), 100.0)[:, None] * d
        lpos = s.lights.position[0]
        to_l = lpos[None] - hitp
        dist = jnp.sqrt(jnp.maximum((to_l * to_l).sum(-1), 1e-12))
        ldir = to_l / dist[:, None]
        return _tri_packet_transmittance(
            s, hitp + ldir * 1e-3, ldir, dist, 1e-3, spec)

    sj = jax.jit(shadow)
    t = timeit(sj, scene, o, d, bt)
    print(f"shadow traversal:      {t:8.2f} ms")

    # shadow-bundle tightness diagnostics
    def shadow_cull(s, o, d, bt):
        hitp = o + jnp.minimum(bt.reshape(-1), 100.0)[:, None] * d
        lpos = s.lights.position[0]
        to_l = lpos[None] - hitp
        dist = jnp.sqrt(jnp.maximum((to_l * to_l).sum(-1), 1e-12))
        ldir = to_l / dist[:, None]
        o_t = (hitp + ldir * 1e-3).reshape(-1, tile_rays, 3)
        d_t = ldir.reshape(-1, tile_rays, 3)
        po, ro, axis, cos_g = pk.make_bundles(o_t, d_t)
        mask, near = pk.cull_blocks(po, ro, axis, cos_g, centers, half_ext)
        _, valid, _ = pk.candidate_leaves(mask, max_blocks, near)
        return valid.sum(axis=-1), cos_g

    scj = jax.jit(shadow_cull)
    scounts, cosg = jax.block_until_ready(scj(scene, o, d, bt))
    sc = np.asarray(scounts); cg = np.asarray(cosg)
    print(f"  shadow cand/tile mean {sc.mean():.1f} max {sc.max()}  "
          f"cos_g mean {cg.mean():.3f}  wide-tiles {(cg <= 0.05).mean():.2%}")

    # (f) whole frame
    def frame(scene, cam):
        img, _ = render_sample(scene, cam, cfg)
        return jnp.sum(img)

    fj = jax.jit(frame)
    t = timeit(fj, scene, cam)
    print(f"full frame:            {t:8.2f} ms")


if __name__ == "__main__":
    main()
