"""Pallas TPU kernels for the block-packet traversal hot path.

Each tile's candidate triangle BLOCKs (ids produced by the dense
cone-vs-block-AABB cull in solr_tpu.ops.packet) are DMA'd straight
from the packed HBM array via BlockSpec index_maps that read the
scalar-prefetched candidate ids — no XLA-side pregather exists at all.
On top of that the kernels add

  * PAIR processing — each grid step fetches and intersects TWO
    candidate blocks (two index_maps), halving per-step overhead,
    which dominates at (1024, 256) tile sizes;
  * dynamic work skipping — grid steps beyond the tile's ACTUAL
    candidate count (scalar-prefetched) are skipped with @pl.when;
  * front-to-back early-out — candidates arrive nearest-first (packet
    sorts by cone-distance lower bound); once every ray's best hit is
    closer than the next pair's lower bound, remaining steps are
    skipped (guard on an SMEM running max).

Layout (all vector, no dynamic VMEM lane indexing — Mosaic cannot index
VMEM lanes dynamically): rays live as (1024, 1) sublane vectors; each
candidate block is a (16, BLOCK) VMEM tile holding the 12 Woop
transform rows (+ shadow factor row 15, see packet.block_pack).  The
Woop ray-triangle chain runs as SIX (1024, 4) @ (4, BLOCK) MXU matmuls
plus a ~16-op VPU epilogue on (1024, BLOCK) tiles; reductions over the
lane (prim) axis fold into a per-tile running best that persists in the
output block across the candidate grid axis (same index_map for every
k — the standard TPU accumulation pattern).

Reference lineage: replaces the per-thread skip-index walk of
GeometryIntersections.cuh: intersectionWithPrimitives; correctness is
pinned by tests against the XLA block path in interpret mode.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from solr_tpu.constants import T_FAR
from solr_tpu.ops.packet import BLOCK

__all__ = ["tri_blocks_closest_pallas", "tri_blocks_transmittance_pallas"]

TILE_RAYS = 1024  # rays per tile: (1024, 1) sublane vector
PAIR = 2  # candidate blocks intersected per grid step

_BIG_I = 2**31 - 1  # python int: jnp scalars would be captured consts


def _woop_block(o4, d4, w, t_min):
    """Woop unit-triangle intersection: (1024, 4) homogeneous rays x a
    packed (16, BLOCK) transform tile -> (1024, BLOCK) t.

    The affine world->unit-triangle transform turns per-pair geometry
    into SIX (1024, 4) @ (4, BLOCK) matmuls (MXU work, ~free) plus a
    ~16-op VPU epilogue.  Degenerate (padded) triangles have all-zero
    rows -> d'z == 0 -> never hit.  Row 12 of ``w`` is all zeros — the
    m-column for the direction transform.
    """
    t1 = w[0:4]  # (4, BLOCK): [r1x r1y r1z m1]
    t2 = w[4:8]
    t3 = w[8:12]
    zrow = w[12:13]
    td = jnp.concatenate([w[0:3], zrow], axis=0)
    te = jnp.concatenate([w[4:7], zrow], axis=0)
    tf = jnp.concatenate([w[8:11], zrow], axis=0)

    dot = lambda a, b: jnp.dot(a, b, preferred_element_type=jnp.float32)
    opx = dot(o4, t1)  # (1024, BLOCK) local-origin components
    opy = dot(o4, t2)
    opz = dot(o4, t3)
    dpx = dot(d4, td)
    dpy = dot(d4, te)
    dpz = dot(d4, tf)

    safe = jnp.abs(dpz) > 1e-12
    inv = jnp.where(safe, 1.0, 0.0) / jnp.where(safe, dpz, 1.0)
    t = -opz * inv
    u = opx + t * dpx
    v = opy + t * dpy
    valid = safe & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
    return jnp.where(valid & (t > t_min), t, T_FAR)


def _ray_mats(ox, oy, oz, dx, dy, dz):
    """(1, 1024, 1) refs -> homogeneous (1024, 4) origin/direction."""
    o4 = jnp.concatenate(
        [ox[0], oy[0], oz[0], jnp.ones_like(ox[0])], axis=1
    )
    d4 = jnp.concatenate(
        [dx[0], dy[0], dz[0], jnp.zeros_like(dx[0])], axis=1
    )
    return o4, d4


def _closest_kernel(
    counts_ref, cand_ref, near_ref,  # scalar prefetch: (T,), (T,K), (T,K)
    ox, oy, oz, dx, dy, dz,  # (1, 1024, 1) ray blocks
    wa_ref, wb_ref,  # (1, 16, BLOCK) packed Woop pair (DMA'd by index_map)
    bt_ref, bi_ref,  # (1, 1024, 1) outputs, persistent across k
    maxb_ref,  # SMEM (1,) f32: running max over rays of best_t
    *, t_min,
):
    i = pl.program_id(0)
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _():
        bt_ref[...] = jnp.full((1, TILE_RAYS, 1), T_FAR, jnp.float32)
        bi_ref[...] = jnp.full((1, TILE_RAYS, 1), -1, jnp.int32)
        maxb_ref[0] = T_FAR

    def fold(w_ref, slot):
        o4, d4 = _ray_mats(ox, oy, oz, dx, dy, dz)
        t = _woop_block(o4, d4, w_ref[0], t_min)  # (1024, BLOCK)
        base = cand_ref[i, PAIR * k + slot] * BLOCK
        pid = base + jax.lax.broadcasted_iota(jnp.int32, (1, BLOCK), 1)
        c_min = jnp.min(t, axis=1, keepdims=True)  # (1024, 1)
        # idx of the winning lane: min over lanes of pid where t == min.
        c_idx = jnp.min(
            jnp.where(t <= c_min, pid, _BIG_I), axis=1, keepdims=True
        )
        bt = bt_ref[0]  # (1024, 1)
        better = c_min < bt
        bt_ref[0] = jnp.where(better, c_min, bt)
        bi_ref[0] = jnp.where(better, c_idx, bi_ref[0])

    alive = near_ref[i, PAIR * k] < maxb_ref[0]

    @pl.when((PAIR * k < counts_ref[i]) & alive)
    def _():
        fold(wa_ref, 0)

    @pl.when((PAIR * k + 1 < counts_ref[i]) & alive)
    def _():
        fold(wb_ref, 1)

    @pl.when((PAIR * k < counts_ref[i]) & alive)
    def _():
        maxb_ref[0] = jnp.max(bt_ref[0])


def _trans_kernel(
    counts_ref, cand_ref, near_ref,
    ox, oy, oz, dx, dy, dz, tmax,  # rays (1, 1024, 1)
    wa_ref, wb_ref,  # (1, 16, BLOCK); row 15 = per-prim shadow factor
    tr_ref,  # (1, 1024, 1) transmittance output
    live_ref,  # SMEM (1,) f32: max transmittance (0 => all shadowed)
    *, t_min,
):
    i = pl.program_id(0)
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _():
        tr_ref[...] = jnp.ones((1, TILE_RAYS, 1), jnp.float32)
        live_ref[0] = 1.0

    def fold(w_ref):
        o4, d4 = _ray_mats(ox, oy, oz, dx, dy, dz)
        w = w_ref[0]
        t = _woop_block(o4, d4, w, t_min)
        occ = t < tmax[0]  # (1024, BLOCK)
        f = jnp.where(occ, w[15:16], 1.0)
        # Lane product via exp(sum(log)): Mosaic has no reduce_prod
        # lowering on the TC kernel path.  Exact at the boundaries
        # (log(0) = -inf -> exp = 0; log(1) = 0) and f in [0, 1].
        logf = jnp.log(jnp.maximum(f, 0.0))
        tr_ref[0] = tr_ref[0] * jnp.exp(jnp.sum(logf, axis=1, keepdims=True))

    alive = live_ref[0] > 1e-6

    @pl.when((PAIR * k < counts_ref[i]) & alive)
    def _():
        fold(wa_ref)

    @pl.when((PAIR * k + 1 < counts_ref[i]) & alive)
    def _():
        fold(wb_ref)

    @pl.when((PAIR * k < counts_ref[i]) & alive)
    def _():
        live_ref[0] = jnp.max(tr_ref[0])


def _ray_blocks(o_t, d_t):
    t_tiles = o_t.shape[0]
    rs = lambda a: a.reshape(t_tiles, TILE_RAYS, 1)
    return tuple(
        rs(arr[..., i]) for arr in (o_t, d_t) for i in range(3)
    )


def _pad_pair(cand, near_sorted):
    """Pad the candidate axis to a multiple of PAIR."""
    k = cand.shape[1]
    pad = (-k) % PAIR
    if pad:
        cand = jnp.pad(cand, ((0, 0), (0, pad)))
        near_sorted = jnp.pad(near_sorted, ((0, 0), (0, pad)),
                              constant_values=T_FAR)
    return cand, near_sorted


_ray_spec = pl.BlockSpec(
    (1, TILE_RAYS, 1),
    lambda i, k, *_: (i, 0, 0),
    memory_space=pltpu.VMEM,
)
# THE trick: the packed Woop array stays in HBM; each grid step DMAs
# only the tile's two next candidate blocks, addressed by the
# prefetched candidate ids (scalar-prefetch operands come after the
# grid indices in the index_map signature).
_woop_spec_a = pl.BlockSpec(
    (1, 16, BLOCK),
    lambda i, k, counts, cand, near: (cand[i, PAIR * k], 0, 0),
    memory_space=pltpu.VMEM,
)
_woop_spec_b = pl.BlockSpec(
    (1, 16, BLOCK),
    lambda i, k, counts, cand, near: (cand[i, PAIR * k + 1], 0, 0),
    memory_space=pltpu.VMEM,
)
_out_spec = pl.BlockSpec(
    (1, TILE_RAYS, 1),
    lambda i, k, *_: (i, 0, 0),
    memory_space=pltpu.VMEM,
)


def tri_blocks_closest_pallas(
    packed, o_t, d_t, cand, counts, near_sorted, t_min,
    interpret: bool = False,
):
    """Pallas closest hit: (T, TR) t and prim idx.

    packed (B, 16, BLOCK) from packet.block_pack; o_t/d_t (T, 1024, 3);
    cand (T, K) nearest-first candidate block ids; counts (T,) valid
    candidates; near_sorted (T, K) their distance lower bounds.
    """
    assert o_t.shape[1] == TILE_RAYS, "packet tile must be 1024 rays"
    cand, near_sorted = _pad_pair(cand, near_sorted)
    t_tiles, k_max = cand.shape
    rays = _ray_blocks(o_t, d_t)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(t_tiles, k_max // PAIR),
        in_specs=[_ray_spec] * 6 + [_woop_spec_a, _woop_spec_b],
        out_specs=(_out_spec, _out_spec),
        scratch_shapes=[pltpu.SMEM((1,), jnp.float32)],
    )
    bt, bi = pl.pallas_call(
        functools.partial(_closest_kernel, t_min=t_min),
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((t_tiles, TILE_RAYS, 1), jnp.float32),
            jax.ShapeDtypeStruct((t_tiles, TILE_RAYS, 1), jnp.int32),
        ),
        interpret=interpret,
    )(counts, cand, near_sorted, *rays, packed, packed)
    bi = jnp.where(bi == _BIG_I, -1, bi)
    return bt.reshape(t_tiles, TILE_RAYS), bi.reshape(t_tiles, TILE_RAYS)


def tri_blocks_transmittance_pallas(
    packed, o_t, d_t, t_max_t, cand, counts, near_sorted, t_min,
    interpret: bool = False,
):
    """Pallas shadow transmittance: (T, TR) in [0, 1]."""
    assert o_t.shape[1] == TILE_RAYS
    cand, near_sorted = _pad_pair(cand, near_sorted)
    t_tiles, k_max = cand.shape
    rays = _ray_blocks(o_t, d_t)
    tmax = t_max_t.reshape(t_tiles, TILE_RAYS, 1)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(t_tiles, k_max // PAIR),
        in_specs=[_ray_spec] * 7 + [_woop_spec_a, _woop_spec_b],
        out_specs=_out_spec,
        scratch_shapes=[pltpu.SMEM((1,), jnp.float32)],
    )
    tr = pl.pallas_call(
        functools.partial(_trans_kernel, t_min=t_min),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (t_tiles, TILE_RAYS, 1), jnp.float32
        ),
        interpret=interpret,
    )(counts, cand, near_sorted, *rays, tmax, packed, packed)
    return tr.reshape(t_tiles, TILE_RAYS)
