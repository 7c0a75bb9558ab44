"""Packet (tile-frustum) traversal: the TPU-native acceleration path.

Why not the reference's per-thread walk: the reference's hottest loop
(GeometryIntersections.cuh: intersectionWithPrimitives) relies on SIMT
per-thread divergence — each ray independently chases skip pointers.  A
TPU VPU has NO per-lane control flow, so a literal translation (per-ray
`lax.while_loop` with gathers, kept in solr_tpu.ops.bvh as the
reference-semantics fallback) runs lock-step over the worst-case ray and
dies on gather latency.

TPU-first redesign (classic packet tracing mapped onto dense XLA ops):

  1. rays are swizzled into spatially-coherent square pixel tiles
     (RenderConfig.packet_tile rays per tile);
  2. each tile's bundle is summarized as an origin-bounding-sphere plus
     a direction cone — 10 floats per tile;
  3. a DENSE (tiles x leaves) cone-vs-leaf-sphere test culls the BVH's
     leaf list in one fully-vectorized shot (the hierarchy is only used
     to FORM good leaves; culling tests all leaf spheres directly,
     which at <= a few hundred thousand leaves is cheaper on a TPU than
     pointer-chasing the tree);
  4. `top_k` compacts each tile's candidate leaves to a static-width
     list (cap = RenderConfig.packet_max_leaves, overflow reported);
  5. each tile brute-force intersects only its candidate leaves'
     primitives — static-shape chunked sweeps over gathered, contiguous
     leaf ranges (the pool is Morton-reordered at build, so leaf prims
     are consecutive rows).

Everything is static-shape, gather-light, and VPU-vectorized over the
tile's rays; per-ray divergence never appears.  Traversal output feeds
scene_closest_hit's detached-select + analytic-recompute, so gradients
are unaffected by the traversal strategy.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from solr_tpu.constants import T_FAR
from solr_tpu.ops import intersect as isect
from solr_tpu.ops.vecmath import dot, normalize

__all__ = [
    "make_bundles",
    "cull_leaves",
    "candidate_leaves",
    "tri_tiles_closest",
    "tri_tiles_transmittance",
    "tile_permutation",
]

# Leaves per inner chunk of the per-tile sweep.
_LEAF_CHUNK = 16


def tile_permutation(width: int, height: int, tile_w: int, tile_h: int):
    """Row-major-pixel -> tile-major permutation (and inverse) as numpy.

    Rays inside one tile are a (tile_h x tile_w) pixel block — the
    spatial coherence that makes bundle cones tight.
    """
    import numpy as np

    assert width % tile_w == 0 and height % tile_h == 0
    idx = np.arange(width * height, dtype=np.int32).reshape(height, width)
    tiles = idx.reshape(
        height // tile_h, tile_h, width // tile_w, tile_w
    ).transpose(0, 2, 1, 3)
    perm = tiles.reshape(-1)
    inv = np.empty_like(perm)
    inv[perm] = np.arange(perm.size, dtype=np.int32)
    return perm, inv


def make_bundles(o_t, d_t):
    """Per-tile bundle: origin sphere (po, ro) + direction cone (axis,
    cos_half_angle).  o_t/d_t: (T, TR, 3)."""
    po = o_t.mean(axis=1)  # (T, 3)
    ro = jnp.sqrt(
        jnp.max(dot(o_t - po[:, None, :], o_t - po[:, None, :]), axis=1)
    )
    axis = normalize(d_t.mean(axis=1))
    cos_g = jnp.min(dot(d_t, axis[:, None, :]), axis=1)
    # Fully incoherent tile -> half-angle >= 90deg: accept everything.
    cos_g = jnp.clip(cos_g, -1.0, 1.0)
    return po, ro, axis, cos_g


def cull_leaves(po, ro, axis, cos_g, centers, radii):
    """(T, L) conservative bundle-vs-sphere visibility + distance.

    Cone from po with axis/cos_g vs sphere (c, r + ro): hit iff the
    center direction is within gamma + beta of the axis, where
    sin(beta) = (r+ro)/dist; or the cone origin is inside the sphere.
    Rays only travel forward, but the sphere test keeps behind-origin
    spheres only when they still contain the origin — the angular test
    rejects the rest (cos_sum formula is conservative for dist > rr).

    Returns (mask (T, L), near (T, L)) where near is a lower bound on
    the hit distance inside the leaf — used to keep the NEAREST
    candidates when a tile overflows the cap.

    SoA component math throughout: (T, L) full-lane shapes; the float3
    form materialized 134 MB x ~12 intermediates at 131k leaves and was
    memory-bound at ~600 ms.
    """
    cx, cy, cz = centers[:, 0][None], centers[:, 1][None], centers[:, 2][None]
    vx = cx - po[:, 0][:, None]  # (T, L)
    vy = cy - po[:, 1][:, None]
    vz = cz - po[:, 2][:, None]
    d2 = vx * vx + vy * vy + vz * vz
    dist = jnp.sqrt(jnp.maximum(d2, 1e-12))
    rr = radii[None, :] + ro[:, None]
    inside = dist <= rr
    sin_b = jnp.clip(rr / dist, 0.0, 1.0)
    cos_b = jnp.sqrt(jnp.maximum(1.0 - sin_b * sin_b, 0.0))
    cos_t = (
        vx * axis[:, 0][:, None]
        + vy * axis[:, 1][:, None]
        + vz * axis[:, 2][:, None]
    ) / dist
    sin_g = jnp.sqrt(jnp.maximum(1.0 - cos_g * cos_g, 0.0))
    cos_sum = cos_g[:, None] * cos_b - sin_g[:, None] * sin_b  # cos(g+b)
    mask = inside | (cos_t >= cos_sum)
    near = jnp.maximum(dist - rr, 0.0)
    return mask, near


def candidate_leaves(mask, max_leaves: int, near=None):
    """Compact each tile's True lanes to (T, max_leaves) leaf indices.

    With ``near`` (lower-bound hit distance per (tile, leaf)), the
    NEAREST candidates are kept, so an overflowing tile drops only its
    farthest leaves — harmless for closest-hit whenever a nearer hit
    exists, and the degradation is graceful rather than systematic.

    Returns (idx, valid, overflow): overflow bool() — True when any
    tile exceeded the cap (tests assert no overflow for exactness).
    """
    counts = mask.sum(axis=-1)
    max_leaves = min(max_leaves, mask.shape[-1])
    if near is None:
        score = mask.astype(jnp.float32)
    else:
        big = jnp.asarray(1e30, near.dtype)
        score = jnp.where(mask, -near, -big)  # nearest first
    _, idx = jax.lax.top_k(score, max_leaves)
    valid = jnp.take_along_axis(mask, idx, axis=-1)
    overflow = jnp.any(counts > max_leaves)
    return idx.astype(jnp.int32), valid, overflow


def _pregather(tris, bvh, cand, cand_valid):
    """Expand (T, MAXC) candidate leaves to per-primitive SoA arrays.

    One bulk gather up front (outside the intersect scan — in-scan
    gathers measured 1.9x slower) of the 9 vertex components, each
    (T, MAXC*LS).  Returns (components, pid, ok).
    """
    ls = bvh.leaf_size
    n = tris.v0.shape[0]
    first = bvh.leaf_first[cand]  # (T, MAXC)
    count = bvh.leaf_count[cand]
    pid = jnp.clip(
        first[..., None] + jnp.arange(ls, dtype=jnp.int32), 0, n - 1
    )
    ok = (
        jnp.arange(ls, dtype=jnp.int32) < count[..., None]
    ) & cand_valid[..., None]
    t = cand.shape[0]
    flat = pid.reshape(t, -1)  # (T, P)
    okf = ok.reshape(t, -1)
    comps = tuple(
        arr[flat][..., i]
        for arr in (tris.v0, tris.v1, tris.v2)
        for i in range(3)
    )
    return comps, flat, okf


def _pad_candidates(cand, cand_valid, chunk):
    maxc = cand.shape[1]
    pad = (-maxc) % chunk
    if pad:
        cand = jnp.pad(cand, ((0, 0), (0, pad)))
        cand_valid = jnp.pad(cand_valid, ((0, 0), (0, pad)))
    return cand, cand_valid


def tri_tiles_closest(tris, bvh, o_t, d_t, cand, cand_valid, t_min):
    """Closest hit per ray, per tile: (T, TR) t and (T, TR) prim idx.

    o_t/d_t (T, TR, 3); cand/cand_valid (T, MAXC).
    """
    chunk = min(_LEAF_CHUNK, cand.shape[1])
    cand, cand_valid = _pad_candidates(cand, cand_valid, chunk)
    comps, flat, okf = _pregather(tris, bvh, cand, cand_valid)
    pchunk = chunk * bvh.leaf_size  # prims per scan step
    n_chunks = flat.shape[1] // pchunk

    def tile_fn(o, d, okf, flatids, *cs):
        ox, oy, oz = o[:, 0:1], o[:, 1:2], o[:, 2:3]  # (TR, 1)
        dx, dy, dz = d[:, 0:1], d[:, 1:2], d[:, 2:3]

        def body(carry, k):
            best_t, best_i = carry

            def sl(a):
                return jax.lax.dynamic_slice_in_dim(
                    a, k * pchunk, pchunk, axis=0
                )

            t = isect.triangle_t_soa(
                ox, oy, oz, dx, dy, dz,
                *(sl(c)[None] for c in cs), t_min,
            )  # (TR, pchunk) — full-lane SoA math
            t = jnp.where(sl(okf)[None], t, T_FAR)
            c_min = jnp.min(t, axis=-1)
            c_arg = sl(flatids)[jnp.argmin(t, axis=-1)]
            better = c_min < best_t
            return (
                jnp.where(better, c_min, best_t),
                jnp.where(better, c_arg, best_i),
            ), None

        init = (
            jnp.full(o.shape[0], T_FAR, o.dtype),
            jnp.zeros(o.shape[0], jnp.int32),
        )
        (bt, bi), _ = jax.lax.scan(
            body, init, jnp.arange(n_chunks, dtype=jnp.int32)
        )
        return bt, bi

    return jax.vmap(tile_fn)(o_t, d_t, okf, flat, *comps)


def tri_tiles_transmittance(
    tris, bvh, o_t, d_t, t_max_t, cand, cand_valid, t_min, transparency
):
    """Shadow transmittance per ray per tile: (T, TR) in [0, 1].

    transparency: (N_tris,) per-primitive shadow factor (already 1.0 for
    emissive lamps — see scene_transmittance).
    """
    chunk = min(_LEAF_CHUNK, cand.shape[1])
    cand, cand_valid = _pad_candidates(cand, cand_valid, chunk)
    comps, flat, okf = _pregather(tris, bvh, cand, cand_valid)
    ftrans = transparency[flat]  # (T, P)
    pchunk = chunk * bvh.leaf_size
    n_chunks = flat.shape[1] // pchunk

    def tile_fn(o, d, t_max, okf, ftr, *cs):
        ox, oy, oz = o[:, 0:1], o[:, 1:2], o[:, 2:3]
        dx, dy, dz = d[:, 0:1], d[:, 1:2], d[:, 2:3]

        def body(trans, k):
            def sl(a):
                return jax.lax.dynamic_slice_in_dim(
                    a, k * pchunk, pchunk, axis=0
                )

            t = isect.triangle_t_soa(
                ox, oy, oz, dx, dy, dz,
                *(sl(c)[None] for c in cs), t_min,
            )
            occludes = sl(okf)[None] & (t < t_max[:, None])
            return trans * jnp.prod(
                jnp.where(occludes, sl(ftr)[None], 1.0), axis=-1
            ), None

        trans, _ = jax.lax.scan(
            body,
            jnp.ones(o.shape[0], o.dtype),
            jnp.arange(n_chunks, dtype=jnp.int32),
        )
        return trans

    return jax.vmap(tile_fn)(o_t, d_t, t_max_t, okf, ftrans, *comps)
