"""Packet (tile-frustum) traversal: the TPU-native acceleration path.

Why not the reference's per-thread walk: the reference's hottest loop
(GeometryIntersections.cuh: intersectionWithPrimitives) relies on SIMT
per-thread divergence — each ray independently chases skip pointers.  A
TPU VPU has NO per-lane control flow, so a literal translation (per-ray
`lax.while_loop` with gathers, kept in solr_tpu.ops.bvh as the
reference-semantics fallback) runs lock-step over the worst-case ray and
dies on gather latency.

TPU-first redesign (classic packet tracing mapped onto dense XLA ops and
one Pallas kernel):

  1. rays are swizzled into spatially-coherent square pixel tiles
     (RenderConfig.packet_tile rays per tile);
  2. each tile's bundle is summarized as an origin-bounding-sphere plus
     a direction cone — 10 floats per tile;
  3. the Morton-reordered triangle pool is cut into contiguous BLOCKs of
     128 primitives; per-block Woop transforms and bounding spheres are
     recomputed from the live vertices each frame (pure elementwise +
     128-segment reductions — O(N), no gathers, always fresh under
     geometry optimization);
  4. a DENSE (tiles x blocks) cone-vs-block test culls the block list
     in one fully-vectorized shot (at 1M tris there are only ~2k
     blocks — the whole "tree" fits in one vector op, which on a TPU
     beats pointer-chasing by orders of magnitude); `top_k` keeps the
     tile's Kt nearest survivors as a prefilter (a cost bound, not a
     correctness cap — drops carry a per-ray exactness certificate);
  5. every RAY slab-tests the tile's Kt candidate blocks; each 32-ray
     STRIP compacts the union of its rays' hit intervals into its own
     static-width front-to-back candidate list (strip_interval_select
     — the round-5 redesign: measured mean 3.8 blocks/ray vs ~26
     shared per-tile candidates in round 4, PERF.md);
  6. each strip intersects only its own candidate list — on TPU a
     Pallas kernel whose per-strip BlockSpec index_maps read the
     scalar-prefetched candidate ids, so ONLY the touched blocks are
     ever DMA'd from HBM (no XLA-side pregather at all); on CPU an
     equivalent gather+sweep at strip granularity.

Everything is static-shape and VPU-vectorized over the strip's rays;
per-ray divergence never appears.  Traversal output feeds
scene_closest_hit's detached-select + analytic-recompute, so gradients
are unaffected by the traversal strategy.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from solr_tpu.constants import T_FAR
from solr_tpu.ops.vecmath import cross, dot, normalize

__all__ = [
    "BLOCK",
    "STRIP",
    "sphere_pack",
    "build_sph_accel",
    "cylinder_pack",
    "build_cyl_accel",
    "cyl_core",
    "make_bundles",
    "capsule_bundles",
    "cull_blocks",
    "cull_capsule",
    "slab_entries_g",
    "strip_interval_select",
    "strips_per_tile",
    "block_pack",
    "build_tri_accel",
    "tri_blocks_closest",
    "tri_blocks_transmittance",
    "tile_permutation",
]

# Triangles per block: a multiple of the 128-lane vector register row;
# also the DMA granularity of the Pallas kernel.  Bigger blocks cost
# extra (coarser-cull) intersection tests but amortize per-grid-step
# overhead; 256 measured fastest on v5e at 1M tris (512 blows the 16 MB
# scoped-VMEM limit with (1024, BLOCK) f32 intermediates).
import os as _os

BLOCK = int(_os.environ.get("SOLR_PACKET_BLOCK", "256"))

# Rays per strip: the granularity of the per-strip interval lists (two
# pixel rows of a 16-wide tile).  A lane-register row (VPU sublane
# granularity is 8; 32 keeps the (STRIP, BLOCK) Woop matrix a clean
# vector shape while separating depth bands the round-4 strip CONES
# could not (PERF.md: 16x2-px strips discriminate ~0.22deg of elevation
# vs ~1.3deg block subtense — slab intervals separate the same strips
# by DEPTH instead).
STRIP = int(_os.environ.get("SOLR_PACKET_STRIP", "32"))

_BIG = 1.0e30

# Tiles per strip_interval_select lax.map chunk (memory guard for the
# (chunk, SB, Kt) per-ray slab matrices at 1080p+ frames).
_SEL_CHUNK = int(_os.environ.get("SOLR_PACKET_SEL_CHUNK", "2048"))


def strips_per_tile(tile_rays: int) -> int:
    """Strips per tile: STRIP-ray groups when they divide evenly, else
    one whole-tile strip (odd tile shapes in tests)."""
    return tile_rays // STRIP if tile_rays % STRIP == 0 else 1


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


def _masked_mean(x, live, n_live):
    """Mean over live lanes of (T, TR); n_live (T,) pre-counted."""
    denom = jnp.maximum(n_live, 1.0)
    return jnp.sum(jnp.where(live, x, 0.0), axis=1) / denom


def make_bundles(o_t, d_t, live=None):
    """Per-tile bundle: origin sphere (po, ro) + direction cone (axis,
    cos_half_angle).  o_t/d_t: (T, TR, 3).

    ``live`` (T, TR) bool: parked/retired rays (see render._PARK_POS) are
    excluded from the bundle statistics, so one mixed live/parked tile
    does not blow its origin sphere up to the parking distance.  A fully
    dead tile degenerates to a point bundle at the parking spot, which
    every cull rejects.

    SoA component math: reductions run on (T, TR) full-lane shapes —
    the (T, TR, 3) minor-dim-3 form wastes 125 of 128 vector lanes.
    """
    ox, oy, oz = o_t[..., 0], o_t[..., 1], o_t[..., 2]  # (T, TR)
    dx, dy, dz = d_t[..., 0], d_t[..., 1], d_t[..., 2]
    if live is None:
        live = jnp.ones(ox.shape, bool)
    n_live = jnp.sum(live.astype(o_t.dtype), axis=1)  # (T,)
    px = _masked_mean(ox, live, n_live)
    py = _masked_mean(oy, live, n_live)
    pz = _masked_mean(oz, live, n_live)
    rx, ry, rz = ox - px[:, None], oy - py[:, None], oz - pz[:, None]
    r2 = jnp.where(live, rx * rx + ry * ry + rz * rz, 0.0)
    ro = jnp.sqrt(jnp.max(r2, axis=1))
    ax = _masked_mean(dx, live, n_live)
    ay = _masked_mean(dy, live, n_live)
    az = _masked_mean(dz, live, n_live)
    an = jnp.sqrt(jnp.maximum(ax * ax + ay * ay + az * az, 1e-12))
    ax, ay, az = ax / an, ay / an, az / an
    cosv = dx * ax[:, None] + dy * ay[:, None] + dz * az[:, None]
    cos_g = jnp.min(jnp.where(live, cosv, 1.0), axis=1)
    # Fully incoherent tile -> half-angle >= 90deg: accept everything.
    cos_g = jnp.clip(cos_g, -1.0, 1.0)
    po = jnp.stack([px, py, pz], axis=-1)
    axis = jnp.stack([ax, ay, az], axis=-1)
    return po, ro, axis, cos_g


def capsule_bundles(o_t, d_t, tmax_t, live=None):
    """Per-tile SEGMENT bundle for shadow rays: origin sphere (po, ro)
    plus endpoint sphere (pa, ra) around the per-ray segment ends
    ``o + d * t_max`` (all segments point at the same light, so the
    endpoint sphere is tiny — zero for hard shadows, the jitter radius
    for soft shadows).  The union of the segments is contained in the
    convex hull of the two spheres, giving a far tighter cull than the
    direction cone for the incoherent shadow bundles a rough surface
    produces (VERDICT round 1: the `~narrow` accept-all collapse).
    """
    ex = o_t[..., 0] + d_t[..., 0] * tmax_t  # (T, TR) segment endpoints
    ey = o_t[..., 1] + d_t[..., 1] * tmax_t
    ez = o_t[..., 2] + d_t[..., 2] * tmax_t
    ox, oy, oz = o_t[..., 0], o_t[..., 1], o_t[..., 2]
    if live is None:
        live = jnp.ones(ox.shape, bool)
    n_live = jnp.sum(live.astype(o_t.dtype), axis=1)
    px = _masked_mean(ox, live, n_live)
    py = _masked_mean(oy, live, n_live)
    pz = _masked_mean(oz, live, n_live)
    r2 = jnp.where(
        live,
        (ox - px[:, None]) ** 2 + (oy - py[:, None]) ** 2
        + (oz - pz[:, None]) ** 2,
        0.0,
    )
    ro = jnp.sqrt(jnp.max(r2, axis=1))
    qx = _masked_mean(ex, live, n_live)
    qy = _masked_mean(ey, live, n_live)
    qz = _masked_mean(ez, live, n_live)
    a2 = jnp.where(
        live,
        (ex - qx[:, None]) ** 2 + (ey - qy[:, None]) ** 2
        + (ez - qz[:, None]) ** 2,
        0.0,
    )
    ra = jnp.sqrt(jnp.max(a2, axis=1))
    po = jnp.stack([px, py, pz], axis=-1)
    pa = jnp.stack([qx, qy, qz], axis=-1)
    return po, ro, pa, ra


def cull_blocks(po, ro, axis, cos_g, centers, half_extents):
    """(T, B) conservative bundle-vs-AABB visibility + distance.

    Support-function cone test: for box center c, half-extents h, and
    bundle (origin sphere (po, ro), cone (axis a, half-angle g)):

      v      = c - po;  t_c = v.a;  perp = |v - t_c a|
      u      = (v - t_c a) / perp        (approach direction, u ⊥ a)
      r_perp = h . |u|                   (box support along u)
      r_axis = h . |a|                   (box support along a)

    Every box point's distance to the axis LINE is >= perp - r_perp
    (support-function bound, exact for convex sets), and the cone's
    radius never exceeds ro + max(t_c + r_axis, 0) * tan(g) over the
    box's axis span — so

      visible  iff  perp - r_perp <= ro + max(t_c + r_axis, 0) tan(g)
               and  t_c + r_axis >= -ro            (not entirely behind)

    Wide bundles (cos_g <= 0.05, i.e. half-angle ~>= 87deg: incoherent
    secondary tiles) skip the angular test and keep only the behind
    reject with the sphere bound.  Much tighter than the sphere test
    for the flat blocks of surface meshes (~2x fewer candidates on the
    1M-tri terrain bench).

    Returns (mask (T, B), near (T, B)); near = max(|v| - |h| - ro, 0)
    is a valid lower bound on any bundle ray's hit distance in the box.

    SoA component math throughout — (T, B) full-lane shapes only.
    """
    cx, cy, cz = centers[:, 0][None], centers[:, 1][None], centers[:, 2][None]
    hx, hy, hz = (
        half_extents[:, 0][None],
        half_extents[:, 1][None],
        half_extents[:, 2][None],
    )
    return _cone_core(po, ro, axis, cos_g, cx, cy, cz, hx, hy, hz)


def _cone_core(po, ro, axis, cos_g, cx, cy, cz, hx, hy, hz):
    vx = cx - po[:, 0][:, None]  # (T, B)
    vy = cy - po[:, 1][:, None]
    vz = cz - po[:, 2][:, None]
    ax, ay, az = axis[:, 0][:, None], axis[:, 1][:, None], axis[:, 2][:, None]
    t_c = vx * ax + vy * ay + vz * az
    d2 = vx * vx + vy * vy + vz * vz
    perp2 = jnp.maximum(d2 - t_c * t_c, 0.0)
    perp = jnp.sqrt(perp2)
    inv_p = jnp.where(perp > 1e-9, 1.0, 0.0) / jnp.where(perp > 1e-9, perp, 1.0)
    # |u| components; u = (v - t_c a) / perp.
    r_perp = (
        hx * jnp.abs(vx - t_c * ax)
        + hy * jnp.abs(vy - t_c * ay)
        + hz * jnp.abs(vz - t_c * az)
    ) * inv_p
    # perp ~ 0 (axis through center): support radius in ANY perp
    # direction is bounded by |h|; fall back to that.
    h_norm = jnp.sqrt(hx * hx + hy * hy + hz * hz)
    r_perp = jnp.where(perp > 1e-9, r_perp, h_norm)
    r_axis = hx * jnp.abs(ax) + hy * jnp.abs(ay) + hz * jnp.abs(az)

    rr = ro[:, None]
    cg = cos_g[:, None]
    sin_g = jnp.sqrt(jnp.maximum(1.0 - cg * cg, 0.0))
    tan_g = sin_g / jnp.maximum(cg, 1e-3)
    reach = jnp.maximum(t_c + r_axis, 0.0)
    narrow = cg > 0.05
    ahead = t_c + r_axis >= -rr
    ang_ok = perp - r_perp <= rr + reach * tan_g
    near_sphere_hit = jnp.sqrt(d2) <= h_norm + rr  # origin inside/near box
    # Wide bundles (~narrow): directions span nearly everywhere, so the
    # mean-axis 'ahead'/angular tests are meaningless — accept all.
    mask = ~narrow | near_sphere_hit | (ahead & ang_ok)
    # Hit-distance lower bound, the max of two direction-free bounds:
    #   radial:  t = |p - o| >= |v| - |h| - ro        (triangle ineq.)
    #   axial:   t = |p - o| >= (p - o).a >= t_c - r_axis - ro
    #            (Cauchy-Schwarz with |a| = 1; valid for ANY ray
    #            direction, so it needs no cone-angle correction)
    # The axial bound is far tighter for the flat, ahead-of-the-bundle
    # blocks of a grazing terrain view — it is what makes front-to-back
    # early-out and the dropped-candidate exactness proof actually fire
    # (round 2 shipped only the radial bound: 41% of rays failed the
    # proof and re-walked — VERDICT r02 weak #2).
    near = jnp.maximum(jnp.sqrt(d2) - h_norm - rr, t_c - r_axis - rr)
    near = jnp.maximum(near, 0.0)
    return mask, near


def cull_capsule(po, ro, pa, ra, centers, half_extents):
    """(T, B) conservative segment-bundle vs AABB test (shared boxes).

    The bundle is the convex hull of spheres (po, ro) and (pa, ra) — see
    :func:`capsule_bundles`.  A box can occlude only if its center's
    distance to the segment [po, pa] is within the box support radius
    plus max(ro, ra).  ``near`` = that slack, a lower bound on any
    bundle ray's hit distance inside the box (ordering only).
    """
    cx, cy, cz = centers[:, 0][None], centers[:, 1][None], centers[:, 2][None]
    hx, hy, hz = (
        half_extents[:, 0][None],
        half_extents[:, 1][None],
        half_extents[:, 2][None],
    )
    return _capsule_core(po, ro, pa, ra, cx, cy, cz, hx, hy, hz)


def _capsule_core(po, ro, pa, ra, cx, cy, cz, hx, hy, hz):
    ux = pa[:, 0] - po[:, 0]  # (T,)
    uy = pa[:, 1] - po[:, 1]
    uz = pa[:, 2] - po[:, 2]
    ln = jnp.sqrt(jnp.maximum(ux * ux + uy * uy + uz * uz, 1e-12))
    ux, uy, uz = ux / ln, uy / ln, uz / ln
    vx = cx - po[:, 0][:, None]  # (T, B)
    vy = cy - po[:, 1][:, None]
    vz = cz - po[:, 2][:, None]
    t_c = vx * ux[:, None] + vy * uy[:, None] + vz * uz[:, None]
    s = jnp.clip(t_c, 0.0, ln[:, None])
    wx = vx - s * ux[:, None]
    wy = vy - s * uy[:, None]
    wz = vz - s * uz[:, None]
    d2 = wx * wx + wy * wy + wz * wz
    d = jnp.sqrt(jnp.maximum(d2, 1e-12))
    inv_d = jnp.where(d > 1e-6, 1.0, 0.0) / jnp.where(d > 1e-6, d, 1.0)
    support = (hx * jnp.abs(wx) + hy * jnp.abs(wy) + hz * jnp.abs(wz)) * inv_d
    h_norm = jnp.sqrt(hx * hx + hy * hy + hz * hz)
    support = jnp.where(d > 1e-6, support, h_norm)
    rmax = jnp.maximum(ro, ra)[:, None]
    slack = d - support - rmax
    mask = slack <= 1e-5
    near = jnp.maximum(slack, 0.0)
    return mask, near


def ray_box_exit(o, d, bmin, bmax):
    """Per-ray exit distance through an AABB (slab test); 0 when the ray
    misses the box entirely.  o/d (..., 3); bmin/bmax (3,).

    Used as a per-ray upper bound on ANY possible hit distance: all
    geometry lives inside the scene box, so a ray is provably complete
    once every unvisited candidate's lower bound exceeds min(best_t,
    exit_t) — this is what lets sky/miss rays (best_t = T_FAR) stop
    stalling the packet early-out and the exactness proof.
    """
    inv = jnp.where(jnp.abs(d) > 1e-12, 1.0, 0.0) / jnp.where(
        jnp.abs(d) > 1e-12, d, 1.0
    )
    t0 = (bmin - o) * inv
    t1 = (bmax - o) * inv
    # Degenerate axes (d ~ 0): inside the slab -> (-inf, +inf) in
    # spirit; approximate with +/- BIG only when outside.
    lo = jnp.minimum(t0, t1)
    hi = jnp.maximum(t0, t1)
    deg = jnp.abs(d) <= 1e-12
    inside = (o >= bmin) & (o <= bmax)
    lo = jnp.where(deg, jnp.where(inside, -_BIG, _BIG), lo)
    hi = jnp.where(deg, jnp.where(inside, _BIG, -_BIG), hi)
    t_enter = jnp.max(lo, axis=-1)
    t_exit = jnp.min(hi, axis=-1)
    hit = (t_exit >= t_enter) & (t_exit > 0.0)
    return jnp.where(hit, t_exit, 0.0)


def slab_entries_g(o_t, d_t, bounds_g, t_min):
    """Per-(ray, candidate) AABB slab test against per-tile gathered
    block bounds: (entry (S, SB, Kt), hit (S, SB, Kt)).

    o_t/d_t (S, SB, 3); bounds_g (S, Kt, 8) rows [center, half-extent]
    (padding blocks park at +BIG and never hit).  ``entry`` is the
    clamped-to-0 slab entry distance — a valid lower bound on any hit t
    inside the block, which is what makes the per-strip front-to-back
    order and the drop certificate exact.  SoA per-axis math: six
    (S, SB, Kt) broadcasts, no (.., 3) minor dim.
    """
    big = _BIG

    def axis(o_a, d_a, c_a, h_a):
        # o_a/d_a (S, SB); c_a/h_a (S, Kt)
        safe = jnp.abs(d_a) > 1e-12
        inv = jnp.where(safe, 1.0, 0.0) / jnp.where(safe, d_a, 1.0)
        off = o_a[..., None]  # (S, SB, 1)
        c_b = c_a[:, None, :]  # (S, 1, Kt)
        h_b = h_a[:, None, :]
        lo = (c_b - h_b - off) * inv[..., None]
        hi = (c_b + h_b - off) * inv[..., None]
        t0 = jnp.minimum(lo, hi)
        t1 = jnp.maximum(lo, hi)
        inside = jnp.abs(off - c_b) <= h_b
        deg = ~safe[..., None]
        t0 = jnp.where(deg, jnp.where(inside, -big, big), t0)
        t1 = jnp.where(deg, jnp.where(inside, big, -big), t1)
        return t0, t1

    x0, x1 = axis(o_t[..., 0], d_t[..., 0], bounds_g[..., 0],
                  bounds_g[..., 3])
    y0, y1 = axis(o_t[..., 1], d_t[..., 1], bounds_g[..., 1],
                  bounds_g[..., 4])
    z0, z1 = axis(o_t[..., 2], d_t[..., 2], bounds_g[..., 2],
                  bounds_g[..., 5])
    t_enter = jnp.maximum(jnp.maximum(x0, y0), z0)
    t_exit = jnp.minimum(jnp.minimum(x1, y1), z1)
    hit = (t_exit >= t_enter) & (t_exit > t_min)
    return jnp.maximum(t_enter, 0.0), hit


def strip_interval_select(o_t, d_t, live, accel, kt: int, ks: int,
                          t_min, tm_t=None):
    """Per-strip front-to-back block-interval candidate lists — the
    round-5 traversal selection (VERDICT r04 missing #1; PERF.md
    round-5 datum: per-ray slab intervals touch mean 3.8 blocks vs ~26
    shared per-tile candidates).

    Two stages, both dense and cap-certified:
      1. tile prefilter: conservative bundle cull (direction cone for
         eye rays, origin->light capsule when ``tm_t`` is given) of the
         FULL block list, then the Kt nearest survivors;
      2. per-ray slab tests against those Kt blocks; each STRIP-ray
         group keeps the union of its rays' hit blocks, sorted by
         min-entry, cut at ks.

    Any drop (tile prefilter overflow or strip list overflow) is
    certified PER RAY by ``dropped`` (S, SB): a lower bound on the hit
    distance inside ANY dropped block for that ray (+FAR when nothing
    was dropped or the ray provably misses every dropped block).  Tile
    prefilter drops are bounded by the ray's slab entry into the AABB
    of the dropped set — a reflected sky ray whose path leaves the
    dropped region is proven exact even though its box exit is huge
    (the tile-level distance bound of the first round-5 cut marked ALL
    such rays unproven, and the union net made bounce 1 cost 2x bounce
    0).  Strip-list overflow is bounded by the (K+1)-th strip entry.
    The caller union-net-walks the (measured-zero at the default
    widths) remainder.

    Args: o_t/d_t (S, SB, 3); live (S, SB) bool; accel a TriAccel;
    kt/ks the prefilter and per-strip widths; tm_t (S, SB) per-ray
    max distance (shadow segments) or None (closest hit).

    Returns (cand (S, G, K) int32, counts (S, G) int32,
    nearb (S, G, K) ascending entry bounds (+FAR past counts),
    dropped (S, SB)).

    Large frames chunk the tile axis through lax.map (one compile):
    the per-ray slab matrices are (chunk, SB, Kt) — at 1080p stereo
    (8100 tiles) the unchunked form would materialize ~2.4 GB per
    intermediate; chunks of ``_SEL_CHUNK`` keep the peak ~300 MB while
    the outputs (S, G, K) stay small.
    """
    s_tiles = o_t.shape[0]
    if s_tiles > _SEL_CHUNK:
        pad = (-s_tiles) % _SEL_CHUNK
        def p0(a):
            return jnp.pad(a, ((0, pad),) + ((0, 0),) * (a.ndim - 1)) \
                if pad else a
        n = (s_tiles + pad) // _SEL_CHUNK
        def re(a):
            return p0(a).reshape((n, _SEL_CHUNK) + a.shape[1:])
        args = (re(o_t), re(d_t), re(live)) + (
            (re(tm_t),) if tm_t is not None else ()
        )
        def one(xs):
            tm = xs[3] if tm_t is not None else None
            return strip_interval_select(
                xs[0], xs[1], xs[2], accel, kt, ks, t_min, tm_t=tm
            )
        outs = jax.lax.map(one, args)
        return tuple(
            o.reshape((n * _SEL_CHUNK,) + o.shape[2:])[:s_tiles]
            for o in outs
        )
    sb = o_t.shape[1]
    g = strips_per_tile(sb)
    bb = accel.block_bounds
    nb = bb.shape[0]
    big = jnp.asarray(_BIG, o_t.dtype)

    if tm_t is None:
        po, ro, axis, cos_g = make_bundles(o_t, d_t, live)
        mask, near = cull_blocks(po, ro, axis, cos_g, bb[:, 0:3],
                                 bb[:, 3:6])
    else:
        po, ro, pa, ra = capsule_bundles(o_t, d_t, tm_t, live)
        mask, near = cull_capsule(po, ro, pa, ra, bb[:, 0:3], bb[:, 3:6])
    mask = mask & jnp.any(live, axis=1)[:, None]

    kt_eff = min(kt, nb)
    score = jnp.where(mask, -near, -big)
    topv, topi = jax.lax.top_k(score, kt_eff)
    tile_cand = topi
    tile_valid = topv > -big * 0.5

    # Per-ray tile-drop certificate: the AABB of the cull-passing
    # blocks the prefilter did NOT keep.  A hit inside any dropped
    # block lies inside this box, so the ray's slab entry into it is a
    # valid lower bound — and a ray whose path misses the box entirely
    # is proven exact regardless of how far it travels.
    if nb > kt_eff:
        sel = jnp.zeros((s_tiles, nb), bool).at[
            jnp.arange(s_tiles)[:, None], tile_cand
        ].set(tile_valid)
        drop = mask & ~sel  # (S, B)
        dmin = jnp.stack([
            jnp.min(jnp.where(drop, bb[:, i][None] - bb[:, 3 + i][None],
                              big), axis=1)
            for i in range(3)
        ], axis=-1)  # (S, 3)
        dmax = jnp.stack([
            jnp.max(jnp.where(drop, bb[:, i][None] + bb[:, 3 + i][None],
                              -big), axis=1)
            for i in range(3)
        ], axis=-1)
        dc = 0.5 * (dmin + dmax)
        dh = jnp.maximum(0.5 * (dmax - dmin), 0.0)  # empty -> inverted
        entry_d, hit_d = slab_entries_g(
            o_t, d_t, jnp.concatenate(
                [dc, dh, jnp.zeros((s_tiles, 2), o_t.dtype)], axis=-1
            )[:, None, :], t_min,
        )  # (S, SB, 1)
        any_drop = jnp.any(drop, axis=1)
        tile_dropped = jnp.where(
            hit_d[..., 0] & any_drop[:, None], entry_d[..., 0], T_FAR
        )  # (S, SB)
    else:
        tile_dropped = jnp.full((s_tiles, sb), T_FAR, o_t.dtype)

    bbg = jnp.take(bb, tile_cand, axis=0)  # (S, Kt, 8)
    entry, hitm = slab_entries_g(o_t, d_t, bbg, t_min)
    hitm = hitm & tile_valid[:, None, :] & live[..., None]
    if tm_t is not None:
        # Occluders live only in blocks whose interval starts before
        # the light.
        hitm = hitm & (entry <= tm_t[..., None])

    e_s = jnp.where(hitm, entry, big).reshape(
        s_tiles, g, sb // g, kt_eff
    ).min(axis=2)  # (S, G, Kt) per-strip min entry, +BIG when unused

    ks_eff = min(ks, kt_eff)
    v2, i2 = jax.lax.top_k(-e_s, min(ks_eff + 1, kt_eff))
    sel = i2[..., :ks_eff]
    valid2 = v2[..., :ks_eff] > -big * 0.5
    cand = jnp.take_along_axis(
        jnp.broadcast_to(tile_cand[:, None, :], (s_tiles, g, kt_eff)),
        sel, axis=-1,
    ).astype(jnp.int32)
    counts = valid2.sum(axis=-1).astype(jnp.int32)
    # Invalid slots repeat the strip's LAST valid id (0 for empty
    # strips): the kernel's slab index_map is then a bare SMEM load —
    # no per-step clamp arithmetic — and consecutive equal indices let
    # the pipeline skip the copy once a strip is exhausted.
    last = jnp.take_along_axis(
        cand, jnp.maximum(counts - 1, 0)[..., None], axis=-1
    )
    cand = jnp.where(valid2, cand, jnp.where(counts[..., None] > 0,
                                             last, 0))
    nearb = jnp.where(valid2, -v2[..., :ks_eff], T_FAR)
    if kt_eff > ks_eff:
        strip_dropped = jnp.where(
            v2[..., ks_eff] > -big * 0.5, -v2[..., ks_eff], T_FAR
        )
    else:
        strip_dropped = jnp.full((s_tiles, g), T_FAR, o_t.dtype)
    dropped = jnp.minimum(
        jnp.repeat(strip_dropped, sb // g, axis=1), tile_dropped
    )
    return cand, counts, nearb, dropped


# --------------------------------------------------------------------------
# Block data: per-frame Woop transforms + bounding spheres.
# --------------------------------------------------------------------------


def block_pack(tris, factor=None):
    """Pack the (Morton-reordered) triangle pool into per-BLOCK data.

    Returns (packed (B, 16, BLOCK), centers (B, 3), radii (B,)):
      rows 0..11: the Woop world->unit-triangle affine transform
                  [r1x r1y r1z m1 | r2x r2y r2z m2 | r3x r3y r3z m3]
                  (t1/t2/t3 = rows 0:4/4:8/8:12; the direction variants
                  drop the m column — row 12 is kept zero for that);
      rows 12..14: zeros;
      row 15: per-primitive shadow ``factor`` (0 if not given).

    All pure elementwise math + BLOCK-segment reductions over the live
    vertex arrays — O(N), gather-free, recomputed per frame so moving
    geometry never goes stale.  Degenerate (padding) triangles get
    all-zero rows -> d'z == 0 in the kernel -> never hit, and are
    excluded from the block bounds (all-zero rows park at +inf).
    """
    n = tris.v0.shape[0]
    b = (n + BLOCK - 1) // BLOCK
    pad = b * BLOCK - n

    def pv(a):
        return jnp.pad(a, ((0, pad), (0, 0))) if pad else a

    v0, v1, v2 = pv(tris.v0), pv(tris.v1), pv(tris.v2)
    e1 = v1 - v0
    e2 = v2 - v0
    nrm = cross(e1, e2)
    den = dot(nrm, nrm)
    ok = den > 1e-18
    inv = (jnp.where(ok, 1.0, 0.0) / jnp.where(ok, den, 1.0))[:, None]
    r1 = cross(e2, nrm) * inv
    r2 = cross(nrm, e1) * inv
    r3 = nrm * inv
    m1 = -dot(r1, v0)
    m2 = -dot(r2, v0)
    m3 = -dot(r3, v0)

    zeros = jnp.zeros((b * BLOCK,), v0.dtype)
    if factor is None:
        fac = zeros
    else:
        fac = jnp.pad(factor, (0, pad), constant_values=1.0) if pad else factor
    comps = [
        r1[:, 0], r1[:, 1], r1[:, 2], m1,
        r2[:, 0], r2[:, 1], r2[:, 2], m2,
        r3[:, 0], r3[:, 1], r3[:, 2], m3,
        zeros, zeros, zeros, fac,
    ]
    packed = jnp.stack([c.reshape(b, BLOCK) for c in comps], axis=1)

    # Bounding AABB per block over REAL (non-all-zero) triangles.  The
    # half-extent form feeds the support-function cone test in
    # cull_blocks — much tighter than a sphere for the flat "pancake"
    # blocks a Morton-ordered surface mesh produces.
    real = (
        jnp.abs(v0).sum(-1) + jnp.abs(v1).sum(-1) + jnp.abs(v2).sum(-1)
    ) > 0.0
    big = jnp.asarray(1e30, v0.dtype)
    vmin = jnp.minimum(jnp.minimum(v0, v1), v2)
    vmax = jnp.maximum(jnp.maximum(v0, v1), v2)
    vmin = jnp.where(real[:, None], vmin, big)
    vmax = jnp.where(real[:, None], vmax, -big)
    bmin = vmin.reshape(b, BLOCK, 3).min(axis=1)
    bmax = vmax.reshape(b, BLOCK, 3).max(axis=1)
    empty = bmax[:, 0] < bmin[:, 0]
    centers = jnp.where(empty[:, None], big, 0.5 * (bmin + bmax))
    half_extents = jnp.where(
        empty[:, None], 0.0, 0.5 * (bmax - bmin) + 1e-5
    )
    return packed, centers, half_extents


def sphere_pack(spheres, factor=None):
    """Pack the sphere pool into per-BLOCK data for the sweep kernels:
    (packed (B, 16, BLOCK), centers (B, 3), half_extents (B, 3)).

    Rows 0..2 = center xyz, row 3 = radius, rows 4..14 zero, row 15 =
    per-sphere shadow ``factor``.  Padding spheres (radius <= 0) never
    hit and are excluded from block bounds.
    """
    n = spheres.radius.shape[0]
    b = (n + BLOCK - 1) // BLOCK
    pad = b * BLOCK - n
    c = spheres.center
    rad = spheres.radius
    if pad:
        c = jnp.pad(c, ((0, pad), (0, 0)))
        rad = jnp.pad(rad, (0, pad), constant_values=-1.0)
    zeros = jnp.zeros((b * BLOCK,), c.dtype)
    if factor is None:
        fac = zeros
    else:
        fac = jnp.pad(factor, (0, pad), constant_values=1.0) if pad \
            else factor
    comps = [c[:, 0], c[:, 1], c[:, 2], rad] + [zeros] * 11 + [fac]
    packed = jnp.stack([x.reshape(b, BLOCK) for x in comps], axis=1)

    real = rad > 0.0
    big = jnp.asarray(1e30, c.dtype)
    vmin = jnp.where(real[:, None], c - rad[:, None], big)
    vmax = jnp.where(real[:, None], c + rad[:, None], -big)
    bmin = vmin.reshape(b, BLOCK, 3).min(axis=1)
    bmax = vmax.reshape(b, BLOCK, 3).max(axis=1)
    empty = bmax[:, 0] < bmin[:, 0]
    centers = jnp.where(empty[:, None], big, 0.5 * (bmin + bmax))
    half_extents = jnp.where(
        empty[:, None], 0.0, 0.5 * (bmax - bmin) + 1e-5
    )
    return packed, centers, half_extents


def cylinder_pack(cyls, factor=None):
    """Pack the cylinder pool into per-BLOCK data for the sweep kernels:
    (packed (B, 16, BLOCK), centers (B, 3), half_extents (B, 3)).

    Rows 0..2 = p0 xyz, row 3 = radius, rows 4..6 = axis (p1 - p0),
    row 7 = |axis|^2 (precomputed so the kernel skips a dot), rows
    8..14 zero, row 15 = per-cylinder shadow ``factor``.  Padding
    cylinders (radius <= 0) never hit and are excluded from bounds.
    """
    n = cyls.radius.shape[0]
    b = (n + BLOCK - 1) // BLOCK
    pad = b * BLOCK - n
    p0, p1, rad = cyls.p0, cyls.p1, cyls.radius
    if pad:
        p0 = jnp.pad(p0, ((0, pad), (0, 0)))
        p1 = jnp.pad(p1, ((0, pad), (0, 0)))
        rad = jnp.pad(rad, (0, pad), constant_values=-1.0)
    axis = p1 - p0
    h2 = dot(axis, axis)
    zeros = jnp.zeros((b * BLOCK,), p0.dtype)
    if factor is None:
        fac = zeros
    else:
        fac = jnp.pad(factor, (0, pad), constant_values=1.0) if pad \
            else factor
    comps = [
        p0[:, 0], p0[:, 1], p0[:, 2], rad,
        axis[:, 0], axis[:, 1], axis[:, 2], h2,
    ] + [zeros] * 7 + [fac]
    packed = jnp.stack([x.reshape(b, BLOCK) for x in comps], axis=1)

    real = rad > 0.0
    big = jnp.asarray(1e30, p0.dtype)
    lo = jnp.minimum(p0, p1) - rad[:, None]
    hi = jnp.maximum(p0, p1) + rad[:, None]
    vmin = jnp.where(real[:, None], lo, big)
    vmax = jnp.where(real[:, None], hi, -big)
    bmin = vmin.reshape(b, BLOCK, 3).min(axis=1)
    bmax = vmax.reshape(b, BLOCK, 3).max(axis=1)
    empty = bmax[:, 0] < bmin[:, 0]
    centers = jnp.where(empty[:, None], big, 0.5 * (bmin + bmax))
    half_extents = jnp.where(
        empty[:, None], 0.0, 0.5 * (bmax - bmin) + 1e-5
    )
    return packed, centers, half_extents


def build_cyl_accel(cylinders, materials):
    """Cylinder-pool sweep accelerator (PDB sticks / SWC neurite
    scenes: tens of thousands of segments crawl through the per-ray
    BVH gather walk).  Same block/super structure as the triangle
    accel; row 15 carries the shadow factor."""
    m = cylinders.material
    factor = jnp.where(
        materials.emission[m] > 0.0, 1.0, materials.transparency[m]
    )
    packed, centers, half = cylinder_pack(cylinders, factor)
    return _group_blocks(packed, centers, half)


def _group_blocks(packed, centers, half):
    """Shared tail of build_*_accel: pad the block list to the 128-lane
    alignment and derive the block bound rows (padding blocks park at
    +BIG so every cull rejects them)."""
    from solr_tpu.types import TriAccel

    b = packed.shape[0]
    bp = ((b + 127) // 128) * 128
    if bp > b:
        packed = jnp.pad(packed, ((0, bp - b), (0, 0), (0, 0)))
        centers = jnp.concatenate(
            [centers, jnp.full((bp - b, 3), _BIG, centers.dtype)]
        )
        half = jnp.concatenate(
            [half, jnp.zeros((bp - b, 3), half.dtype)]
        )
    zeros2 = jnp.zeros((bp, 2), centers.dtype)
    block_bounds = jnp.concatenate([centers, half, zeros2], axis=-1)
    return TriAccel(
        packed=packed,
        block_bounds=block_bounds,
        block=BLOCK,
    )


def build_sph_accel(spheres, materials):
    """Sphere-pool sweep accelerator (PDB molecule flagship: 100k-atom
    scenes crawl through the per-ray BVH gather walk — VERDICT r02
    missing #6).  Same block/super structure as the triangle accel;
    row 15 carries the shadow factor."""
    m = spheres.material
    factor = jnp.where(
        materials.emission[m] > 0.0, 1.0, materials.transparency[m]
    )
    packed, centers, half = sphere_pack(spheres, factor)
    return _group_blocks(packed, centers, half)


def build_tri_accel(triangles, materials):
    """Precompute the triangle traversal accelerator (reference analog:
    GPUKernel::compactBoxes building the two-level box grid once per
    scene mutation, NOT per frame).

    Row 15 of ``packed`` carries the per-primitive shadow factor
    (transparency; 1.0 for emissive lamps) so ONE packed array serves
    both the closest-hit kernel (ignores row 15) and the shadow kernel.
    Returns a :class:`solr_tpu.types.TriAccel`.
    """
    tri_m = triangles.material
    factor = jnp.where(
        materials.emission[tri_m] > 0.0,
        1.0,
        materials.transparency[tri_m],
    )
    packed, centers, half = block_pack(triangles, factor)
    # _group_blocks pads the block count to the 128-lane alignment;
    # padding blocks park at +BIG so every cull rejects them, and their
    # packed slabs are zero (never hit).
    return _group_blocks(packed, centers, half)


def _woop_t(o_t, d_t, w, t_min):
    """Woop intersection, SoA broadcast form: rays (T, TR, 3) x packed
    block rows w (T, 16, BLOCK) -> t (T, TR, BLOCK)."""
    ox, oy, oz = o_t[..., 0:1], o_t[..., 1:2], o_t[..., 2:3]  # (T, TR, 1)
    dx, dy, dz = d_t[..., 0:1], d_t[..., 1:2], d_t[..., 2:3]
    r = lambda i: w[:, None, i, :]  # (T, 1, BLOCK)
    opx = ox * r(0) + oy * r(1) + oz * r(2) + r(3)
    opy = ox * r(4) + oy * r(5) + oz * r(6) + r(7)
    opz = ox * r(8) + oy * r(9) + oz * r(10) + r(11)
    dpx = dx * r(0) + dy * r(1) + dz * r(2)
    dpy = dx * r(4) + dy * r(5) + dz * r(6)
    dpz = dx * r(8) + dy * r(9) + dz * r(10)
    safe = jnp.abs(dpz) > 1e-12
    inv = jnp.where(safe, 1.0, 0.0) / jnp.where(safe, dpz, 1.0)
    t = -opz * inv
    u = opx + t * dpx
    v = opy + t * dpy
    valid = safe & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
    return jnp.where(valid & (t > t_min), t, T_FAR)


def _sphere_t_blocks(o_t, d_t, w, t_min):
    """Sphere-block test, SoA broadcast form: rays (T, TR, 3) x packed
    sphere rows w (T, 16, BLOCK) -> t (T, TR, BLOCK); rows per
    solr_tpu.ops.packet.sphere_pack."""
    r = lambda i: w[:, None, i, :]  # (T, 1, BLOCK)
    ocx = o_t[..., 0:1] - r(0)
    ocy = o_t[..., 1:2] - r(1)
    ocz = o_t[..., 2:3] - r(2)
    b = ocx * d_t[..., 0:1] + ocy * d_t[..., 1:2] + ocz * d_t[..., 2:3]
    c0 = ocx * ocx + ocy * ocy + ocz * ocz - r(3) * r(3)
    disc = b * b - c0
    valid = (disc > 0.0) & (r(3) > 0.0)
    sq = jnp.sqrt(jnp.where(valid, disc, 1.0))
    t1 = jnp.where(valid & (-b - sq > t_min), -b - sq, T_FAR)
    t2 = jnp.where(valid & (-b + sq > t_min), -b + sq, T_FAR)
    return jnp.minimum(t1, t2)


def cyl_core(c, r, t_min):
    """Capped-cylinder intersection core shared by the XLA block form
    and the Pallas rows form; mirrors solr_tpu.ops.intersect.
    cylinder_t_p exactly (side surface + both end-cap disks, two-sided,
    radius <= 0 padding never hits).

    ``c(i)`` yields ray component i (0..2 origin, 4..6 direction);
    ``r(i)`` yields packed block row i (cylinder_pack layout).  Both
    must broadcast against each other.
    """
    from solr_tpu.constants import INTERSECT_EPS

    ocx, ocy, ocz = c(0) - r(0), c(1) - r(1), c(2) - r(2)
    dx, dy, dz = c(4), c(5), c(6)
    rad = r(3)
    h2 = r(7)
    inv_h2 = 1.0 / jnp.maximum(h2, INTERSECT_EPS)
    d_a = dx * r(4) + dy * r(5) + dz * r(6)
    oc_a = ocx * r(4) + ocy * r(5) + ocz * r(6)
    a = 1.0 - d_a * d_a * inv_h2
    b = (ocx * dx + ocy * dy + ocz * dz) - d_a * oc_a * inv_h2
    cq = (ocx * ocx + ocy * ocy + ocz * ocz) - oc_a * oc_a * inv_h2 \
        - rad * rad
    safe_a = jnp.maximum(a, INTERSECT_EPS)
    disc = b * b - safe_a * cq
    base = (disc > 0.0) & (a > INTERSECT_EPS) & (rad > 0.0)
    sq = jnp.sqrt(jnp.where(base, disc, 1.0))
    t1 = (-b - sq) / safe_a
    t2 = (-b + sq) / safe_a
    s1 = oc_a + t1 * d_a
    s2 = oc_a + t2 * d_a
    t1 = jnp.where(
        base & (s1 >= 0.0) & (s1 <= h2) & (t1 > t_min), t1, T_FAR
    )
    t2 = jnp.where(
        base & (s2 >= 0.0) & (s2 <= h2) & (t2 > t_min), t2, T_FAR
    )
    t_side = jnp.minimum(t1, t2)

    ax_safe = jnp.abs(d_a) > INTERSECT_EPS
    inv_da = jnp.where(ax_safe, 1.0, 0.0) / jnp.where(ax_safe, d_a, 1.0)

    def cap(plane_s, off_scale):
        tc = (plane_s - oc_a) * inv_da
        qx = ocx + tc * dx - off_scale * r(4)
        qy = ocy + tc * dy - off_scale * r(5)
        qz = ocz + tc * dz - off_scale * r(6)
        rad2 = qx * qx + qy * qy + qz * qz
        ok = ax_safe & (rad > 0.0) & (rad2 <= rad * rad) & (tc > t_min)
        return jnp.where(ok, tc, T_FAR)

    return jnp.minimum(t_side, jnp.minimum(cap(0.0, 0.0), cap(h2, 1.0)))


def _cyl_t_blocks(o_t, d_t, w, t_min):
    """Cylinder-block test, SoA broadcast form: rays (T, TR, 3) x packed
    cylinder rows w (T, 16, BLOCK) -> t (T, TR, BLOCK)."""
    r = lambda i: w[:, None, i, :]  # (T, 1, BLOCK)
    comp = {0: o_t[..., 0:1], 1: o_t[..., 1:2], 2: o_t[..., 2:3],
            4: d_t[..., 0:1], 5: d_t[..., 1:2], 6: d_t[..., 2:3]}
    return cyl_core(lambda i: comp[i], r, t_min)


_PRIM_T = {"tri": _woop_t, "sphere": _sphere_t_blocks,
           "cyl": _cyl_t_blocks}


def tri_blocks_closest(packed, o_t, d_t, cand, counts, t_min,
                       prim: str = "tri"):
    """XLA fallback closest hit: (T, TR) t and prim idx.

    packed (B, 16, BLOCK) from block_pack/sphere_pack; o_t/d_t
    (T, TR, 3); cand (T, K) block ids (nearest-first prefix); counts
    (T,) number of valid candidates per tile.
    """
    k_max = cand.shape[1]

    def body(carry, k):
        best_t, best_i = carry
        blk = cand[:, k]  # (T,)
        w = packed[blk]  # (T, 16, BLOCK)
        t = _PRIM_T[prim](o_t, d_t, w, t_min)  # (T, TR, BLOCK)
        t = jnp.where((k < counts)[:, None, None], t, T_FAR)
        c_min = jnp.min(t, axis=-1)  # (T, TR)
        lane = jnp.argmin(t, axis=-1).astype(jnp.int32)
        c_idx = blk[:, None] * BLOCK + lane
        better = c_min < best_t
        return (
            jnp.where(better, c_min, best_t),
            jnp.where(better, c_idx, best_i),
        ), None

    init = (
        jnp.full(o_t.shape[:2], T_FAR, o_t.dtype),
        jnp.full(o_t.shape[:2], -1, jnp.int32),
    )
    (bt, bi), _ = jax.lax.scan(body, init, jnp.arange(k_max))
    return bt, bi


def tri_blocks_transmittance(packed, o_t, d_t, t_max_t, cand, counts,
                             t_min, prim: str = "tri"):
    """XLA fallback shadow transmittance: (T, TR) in [0, 1].

    The per-primitive shadow factor rides in packed row 15 (see
    block_pack/sphere_pack); occluding primitives multiply their factor
    in (reference: processShadows — transparent occluders attenuate).
    """
    k_max = cand.shape[1]

    def body(trans, k):
        blk = cand[:, k]
        w = packed[blk]
        t = _PRIM_T[prim](o_t, d_t, w, t_min)
        occ = (t < t_max_t[..., None]) & (k < counts)[:, None, None]
        f = jnp.where(occ, w[:, None, 15, :], 1.0)
        return trans * jnp.prod(f, axis=-1), None

    trans, _ = jax.lax.scan(
        body, jnp.ones(o_t.shape[:2], o_t.dtype), jnp.arange(k_max)
    )
    return trans
