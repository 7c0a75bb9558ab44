"""Pallas TPU kernels for the block-packet traversal hot path.

Slab design (round 2 — replaces the round-1 per-candidate-grid kernels
whose fixed (tiles x K/2) grid paid per-step overhead for every skipped
candidate): the grid has ONE step per ray sub-bundle; each step receives

  * the sub-bundle's rays as a (SB, 16) VMEM tile
    [ox oy oz 1 | dx dy dz 0 | tmax pad...] — MXU/VPU-ready layout;
  * a contiguous, XLA-pre-gathered slab of its K candidate blocks
    (K, 16, BLOCK) — Pallas auto-pipelines the slab DMA across grid
    steps (double buffering for free);
  * scalar-prefetched candidate counts / ids / front-to-back distance
    lower bounds.

An in-kernel fori_loop walks the candidates nearest-first with TWO
skips: candidates beyond the sub-bundle's count, and — the big one —
front-to-back early termination once EVERY ray's best hit is closer
than the distance lower bound of the next candidate (terrain-style
scenes stop after a handful of blocks).

The Woop world->unit-triangle intersection runs as VPU broadcast math
((SB,1) ray components x (1,BLOCK) transform rows): a (SB,4)@(4,BLOCK)
MXU matmul pads K=4 to the 128-deep systolic array (~3% utilization),
so for this op the VPU is the faster unit.

Reference lineage: replaces the per-thread skip-index walk of
GeometryIntersections.cuh: intersectionWithPrimitives; correctness is
pinned by tests against the XLA block path in interpret mode and by the
exactness net in solr_tpu.ops.traverse.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from solr_tpu.constants import T_FAR
from solr_tpu.ops.packet import BLOCK

__all__ = [
    "slab_closest_pallas",
    "slab_transmittance_pallas",
    "make_rays16",
]

_BIG_I = 2**31 - 1  # python int: jnp scalars would be captured consts


def make_rays16(o_t, d_t, tmax_t=None):
    """(S, SB, 3) rays -> (S, SB, 16) kernel layout
    [ox oy oz 1 | dx dy dz 0 | tmax 0 0 0 0 0 0 0]."""
    s, sb, _ = o_t.shape
    dt = o_t.dtype
    one = jnp.ones((s, sb, 1), dt)
    zero = jnp.zeros((s, sb, 1), dt)
    tm = zero if tmax_t is None else tmax_t[..., None].astype(dt)
    pad = jnp.zeros((s, sb, 7), dt)
    return jnp.concatenate([o_t, one, d_t, zero, tm, pad], axis=-1)


def _woop_rows(rays, w, t_min):
    """VPU-broadcast Woop intersection: rays (SB, 16) x packed block
    rows w (16, BLOCK) -> t (SB, BLOCK).

    Row slices of ``w`` are (1, BLOCK) lane rows; ray components are
    (SB, 1) sublane columns — every product is a full-lane broadcast op.
    Degenerate (padding) triangles have all-zero rows -> d'z == 0 ->
    never hit.
    """
    r = lambda i: w[i : i + 1, :]  # (1, BLOCK)
    c = lambda i: rays[:, i : i + 1]  # (SB, 1)
    ox, oy, oz = c(0), c(1), c(2)
    dx, dy, dz = c(4), c(5), c(6)
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


def _closest_kernel(
    counts_ref, cand_ref, nearb_ref,  # prefetch: (S,), (S,K), (S,K+1)
    rays_ref,  # (1, SB, 16)
    slab_ref,  # (1, K, 16, BLOCK) gathered candidate blocks
    bt_ref, bi_ref,  # (1, SB, 1) outputs
    *, k_max, t_min,
):
    s = pl.program_id(0)
    sb = rays_ref.shape[1]
    bt_ref[...] = jnp.full((1, sb, 1), T_FAR, jnp.float32)
    bi_ref[...] = jnp.full((1, sb, 1), -1, jnp.int32)
    count = counts_ref[s]
    rays = rays_ref[0]

    def body(k, alive):
        @pl.when((k < count) & alive)
        def _():
            w = slab_ref[0, k]  # (16, BLOCK)
            t = _woop_rows(rays, w, t_min)  # (SB, BLOCK)
            base = cand_ref[s, k] * BLOCK
            pid = base + jax.lax.broadcasted_iota(jnp.int32, (1, BLOCK), 1)
            c_min = jnp.min(t, axis=1, keepdims=True)  # (SB, 1)
            c_idx = jnp.min(
                jnp.where(t <= c_min, pid, _BIG_I), axis=1, keepdims=True
            )
            bt = bt_ref[0]
            better = c_min < bt
            bt_ref[0] = jnp.where(better, c_min, bt)
            bi_ref[0] = jnp.where(better, c_idx, bi_ref[0])

        # Front-to-back early-out: stop once every ray's best hit is
        # closer than the lower bound of the NEXT candidate.
        nxt = jnp.minimum(k + 1, k_max)
        return alive & (jnp.max(bt_ref[0]) > nearb_ref[s, nxt])

    jax.lax.fori_loop(0, k_max, body, True)


def _trans_kernel(
    counts_ref,  # prefetch: (S,)
    rays_ref,  # (1, SB, 16); lane 8 = per-ray t_max
    slab_ref,  # (1, K, 16, BLOCK); row 15 = per-prim shadow factor
    tr_ref,  # (1, SB, 1) transmittance output
    *, k_max, t_min,
):
    s = pl.program_id(0)
    sb = rays_ref.shape[1]
    tr_ref[...] = jnp.ones((1, sb, 1), jnp.float32)
    count = counts_ref[s]
    rays = rays_ref[0]
    tmax = rays[:, 8:9]  # (SB, 1)

    def body(k, alive):
        @pl.when((k < count) & alive)
        def _():
            w = slab_ref[0, k]
            t = _woop_rows(rays, w, t_min)
            occ = t < tmax
            f = jnp.where(occ, w[15:16, :], 1.0)
            # Lane product via exp(sum(log)): Mosaic has no reduce_prod
            # lowering on the TC kernel path.  Exact at the boundaries
            # (log(0) = -inf -> exp = 0; log(1) = 0) and f in [0, 1].
            logf = jnp.log(jnp.maximum(f, 0.0))
            tr_ref[0] = tr_ref[0] * jnp.exp(
                jnp.sum(logf, axis=1, keepdims=True)
            )

        # All rays fully shadowed -> nothing left to attenuate.
        return alive & (jnp.max(tr_ref[0]) > 1e-6)

    jax.lax.fori_loop(0, k_max, body, True)


def _specs(k_max: int, sb: int, n_prefetch: int):
    ray_spec = pl.BlockSpec(
        (1, sb, 16), lambda s, *_: (s, 0, 0), memory_space=pltpu.VMEM
    )
    slab_spec = pl.BlockSpec(
        (1, k_max, 16, BLOCK),
        lambda s, *_: (s, 0, 0, 0),
        memory_space=pltpu.VMEM,
    )
    out_spec = pl.BlockSpec(
        (1, sb, 1), lambda s, *_: (s, 0, 0), memory_space=pltpu.VMEM
    )
    return ray_spec, slab_spec, out_spec


def slab_closest_pallas(
    slab, rays16, cand, counts, near_bound, t_min, interpret: bool = False
):
    """Closest hit over pre-gathered candidate slabs.

    slab (S, K, 16, BLOCK); rays16 (S, SB, 16) from make_rays16;
    cand (S, K) block ids (nearest-first); counts (S,); near_bound
    (S, K+1) per-candidate distance lower bounds with a +FAR sentinel.
    Returns (t (S, SB), prim idx (S, SB); -1 = miss).
    """
    s_tiles, k_max = cand.shape
    sb = rays16.shape[1]
    ray_spec, slab_spec, out_spec = _specs(k_max, sb, 3)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(s_tiles,),
        in_specs=[ray_spec, slab_spec],
        out_specs=(out_spec, out_spec),
    )
    bt, bi = pl.pallas_call(
        functools.partial(_closest_kernel, k_max=k_max, t_min=t_min),
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((s_tiles, sb, 1), jnp.float32),
            jax.ShapeDtypeStruct((s_tiles, sb, 1), jnp.int32),
        ),
        interpret=interpret,
    )(counts, cand, near_bound, rays16, slab)
    bi = jnp.where(bi == _BIG_I, -1, bi)
    return bt.reshape(s_tiles, sb), bi.reshape(s_tiles, sb)


def slab_transmittance_pallas(
    slab, rays16, counts, t_min, interpret: bool = False
):
    """Shadow transmittance over pre-gathered candidate slabs: (S, SB)
    in [0, 1].  Per-ray t_max rides in rays16 lane 8."""
    s_tiles, k_max = slab.shape[:2]
    sb = rays16.shape[1]
    ray_spec, slab_spec, out_spec = _specs(k_max, sb, 1)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(s_tiles,),
        in_specs=[ray_spec, slab_spec],
        out_specs=out_spec,
    )
    tr = pl.pallas_call(
        functools.partial(_trans_kernel, k_max=k_max, t_min=t_min),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((s_tiles, sb, 1), jnp.float32),
        interpret=interpret,
    )(counts, rays16, slab)
    return tr.reshape(s_tiles, sb)
