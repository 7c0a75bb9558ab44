"""Pallas TPU kernels: grid-pipelined candidate-block sweep.

Round-3/4 redesign of the traversal hot path (reference lineage:
GeometryIntersections.cuh: intersectionWithPrimitives — the per-thread
skip-index walk).  Hardware findings that shaped this design (all
measured on the v5e this repo benches on; see DEBUGGING.md):

  * In-kernel `lax.while_loop` / data-dependent `fori_loop` bodies and
    manual `make_async_copy` with vector-derived indices make Mosaic
    compiles take 100-300+ s with huge variance — the round-2 driver
    failure ("HTTP 500: tpu_compile_helper") was the remote compile
    service giving up.  Grid-pipelined kernels with the SAME dataflow
    compile in seconds.  So: NO in-kernel loops, NO manual DMA — the
    Pallas grid pipeline does all block movement.
  * Scalar-prefetch operands live in SMEM (~1 MB).  At 1024 tiles the
    round-2 prefetch arrays overflowed it ("Ran out of memory in
    memory space smem") — THE round-2 compile failure at bench scale.
    Tiles are therefore swept in chunks of <= 256 per pallas_call
    (lax.map over chunks; the kernel compiles once).
  * A block whose minor dim is 16 — the round-2 (1, SB, 16) ray layout
    — hits a pathological Mosaic relayout: ~400 us PER GRID STEP
    (the round-2 409x slowdown).  Rays ride transposed as (1, 16, SB)
    lanes-major and are transposed back once per tile in-kernel.

Sweep structure: grid (tiles, K).  Step (s, k) receives the tile's
rays (resident across k) and its k-th nearest candidate block's packed
Woop slab, DMA'd by the pipeline via an index_map that reads the
scalar-prefetched candidate ids — only touched blocks ever leave HBM,
double-buffered for free.  Exhausted tiles clamp to their last
candidate (consecutive equal indices -> the pipeline skips the copy).
Front-to-back early-out: each step first tests the candidate's
distance lower bound against every live ray's current best and skips
the intersection entirely once the tile is provably done.

Round-4 addition — SUB-BUNDLE MASKING (the round-3 compute killer:
every ray in a 256-ray tile paid for every candidate block the TILE
needed, ~22 x 256 Woop tests per ray on the grazing-terrain bench).
Each tile is split into ``sub_g`` contiguous sub-bundles (for a 16x16
pixel tile with sub_g=8: 2-pixel-row strips — depth-stratified on a
terrain view).  A per-(tile, candidate) bitmask, scalar-prefetched from
a per-sub-bundle XLA cull (solr_tpu.ops.packet.subbundle_bits), gates
each sub-bundle's intersection with `pl.when`, and each sub-bundle
keeps its OWN front-to-back cutoff — near strips finish after 2-3
blocks while far strips keep sweeping.  Grid size is unchanged (the
DMA stays per-tile); only the dominant VPU compute shrinks.  The cull
is conservative, so results are bit-identical to the unmasked sweep.

Correctness is pinned by tests against the XLA block path (interpret
mode + on-TPU smoke test) and the exactness net in
solr_tpu.ops.traverse handles capped-out tiles.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from solr_tpu.constants import T_FAR

__all__ = [
    "make_rays16t",
    "sweep_closest",
    "sweep_transmittance",
    "TILE_CHUNK",
]

_BIG_I = 2**31 - 1  # python int: jnp scalars would be captured consts

# Tiles per pallas_call: bounds the scalar-prefetch SMEM footprint
# (chunk * (3K + 2) * 4 bytes; 256 * 98 * 4 = 100 KB at K=32).
TILE_CHUNK = 256


def make_rays16t(o_t, d_t, tmax_t=None, live_t=None):
    """(S, SB, 3) rays -> (S, 16, SB) TRANSPOSED kernel layout; rows
    [ox oy oz 1 | dx dy dz 0 | tmax live 0 0 0 0 0 0].

    Lanes-major: the minor dim is the ray axis (SB, a lane multiple),
    NOT the 16 components — a minor-dim-16 block triggers a Mosaic
    relayout costing ~400 us/step (measured; see module docstring).
    """
    s, sb, _ = o_t.shape
    dt = o_t.dtype
    one = jnp.ones((s, sb, 1), dt)
    zero = jnp.zeros((s, sb, 1), dt)
    # Lane 8 default = T_FAR: "no cap" for the closest kernel's early
    # -out and "everything occludes" for an (unusual) capless shadow.
    tm = (jnp.full((s, sb, 1), T_FAR, dt) if tmax_t is None
          else tmax_t[..., None].astype(dt))
    lv = one if live_t is None else live_t[..., None].astype(dt)
    pad = jnp.zeros((s, sb, 6), dt)
    r16 = jnp.concatenate([o_t, one, d_t, zero, tm, lv, pad], axis=-1)
    return r16.swapaxes(1, 2)  # (S, 16, SB)


def _woop_rows(rays, w, t_min):
    """VPU-broadcast Woop intersection: rays (SB, 16) x packed block
    rows w (16, BLOCK) -> t (SB, BLOCK).

    Row slices of ``w`` are (1, BLOCK) lane rows; ray components are
    (SB, 1) sublane columns — every product is a full-lane broadcast
    op.  Degenerate (padding) triangles have all-zero rows -> d'z == 0
    -> never hit.
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


def _sphere_rows(rays, w, t_min):
    """Ray-sphere block test: rays (SB, 16) x sphere block rows
    [cx cy cz r] (16, BLOCK) -> t (SB, BLOCK).  Nearest root > t_min
    (exit root for inside starts — refraction needs it), matching
    solr_tpu.ops.intersect.sphere_t_p; padding spheres (r <= 0) never
    hit.  The sphere-pool sweep is what makes 100k-atom PDB molecule
    scenes tractable (VERDICT r02 missing #6)."""
    r = lambda i: w[i : i + 1, :]  # (1, BLOCK)
    c = lambda i: rays[:, i : i + 1]  # (SB, 1)
    ocx = c(0) - r(0)
    ocy = c(1) - r(1)
    ocz = c(2) - r(2)
    b = ocx * c(4) + ocy * c(5) + ocz * c(6)
    c0 = ocx * ocx + ocy * ocy + ocz * ocz - r(3) * r(3)
    disc = b * b - c0
    valid = (disc > 0.0) & (r(3) > 0.0)
    sq = jnp.sqrt(jnp.where(valid, disc, 1.0))
    t1 = jnp.where(valid & (-b - sq > t_min), -b - sq, T_FAR)
    t2 = jnp.where(valid & (-b + sq > t_min), -b + sq, T_FAR)
    return jnp.minimum(t1, t2)


def _cyl_rows(rays, w, t_min):
    """Ray-cylinder block test: rays (SB, 16) x cylinder block rows
    (16, BLOCK) -> t (SB, BLOCK); rows per solr_tpu.ops.packet.
    cylinder_pack, math shared with the XLA form via packet.cyl_core
    (capped cylinder matching intersect.cylinder_t_p).  Makes PDB
    sticks / SWC neurite pools sweepable."""
    from solr_tpu.ops.packet import cyl_core

    r = lambda i: w[i : i + 1, :]  # (1, BLOCK)
    c = lambda i: rays[:, i : i + 1]  # (SB, 1)
    return cyl_core(c, r, t_min)


_PRIM_ROWS = {"tri": _woop_rows, "sphere": _sphere_rows,
              "cyl": _cyl_rows}


def _closest_kernel(
    counts_ref, cand_ref, nearb_ref, sub_ref,  # prefetch: (S,), (S,K), (S,K), (S,K)
    rays_ref,  # (1, 16, SB) transposed rays
    slab_ref,  # (1, 16, BLOCK): candidate k's packed block
    bt_ref, bi_ref,  # (1, SB, 1) outputs, resident across k
    nv_ref,  # (1, 1, 1) visit counter
    rsc_ref,  # (SB, 16) VMEM scratch: rays transposed ONCE per tile
    *, block, t_min, prim, sub_g,
):
    s = pl.program_id(0)
    k = pl.program_id(1)
    sb = rays_ref.shape[2]
    ssb = sb // sub_g

    @pl.when(k == 0)
    def _():
        bt_ref[0] = jnp.full((sb, 1), T_FAR, jnp.float32)
        bi_ref[0] = jnp.full((sb, 1), _BIG_I, jnp.int32)
        nv_ref[0] = jnp.zeros((1, 1), jnp.int32)
        # One (16, SB) -> (SB, 16) relayout per TILE, not per step: the
        # per-step transpose measured ~60% of a visited step's 5.9 us
        # (tools/probe_sweep.py, round 4) — rays are resident across k,
        # so the scratch pays it once per K candidates.
        rsc_ref[...] = rays_ref[0].T

    rays = rsc_ref[...]  # (SB, 16)
    live = rays[:, 9:10] > 0.0  # (SB, 1)
    bt = bt_ref[0]
    # Front-to-back early-out, PER SUB-BUNDLE: a sub-bundle skips once
    # every live ray in it is provably complete — its best hit (or its
    # scene-box exit, lane 8: a miss ray can't hit anything past the
    # box, so sky rays don't stall the strip at T_FAR) is closer than
    # this candidate's lower bound.
    t_cap = rays[:, 8:9]
    done_t = jnp.where(live, jnp.minimum(bt, t_cap), 0.0)  # (SB, 1)
    in_count = k < counts_ref[s]
    near_k = nearb_ref[s, k]
    w = slab_ref[0]  # (16, BLOCK)
    pid = cand_ref[s, k] * block + jax.lax.broadcasted_iota(
        jnp.int32, (1, block), 1
    )

    if sub_g == 1:
        # Whole-tile body (the round-3 kernel, known-good on hardware).
        run = in_count & (near_k < jnp.max(done_t))

        @pl.when(run)
        def _():
            t = _PRIM_ROWS[prim](rays, w, t_min)  # (SB, BLOCK)
            c_min = jnp.min(t, axis=1, keepdims=True)  # (SB, 1)
            c_idx = jnp.min(
                jnp.where(t <= c_min, pid, _BIG_I), axis=1, keepdims=True
            )
            better = c_min < bt
            bt_ref[0] = jnp.where(better, c_min, bt)
            bi_ref[0] = jnp.where(better, c_idx, bi_ref[0])
            nv_ref[0] = nv_ref[0] + 1
        return

    bits = sub_ref[s, k]
    runs = []
    for j in range(sub_g):
        cutoff_j = jnp.max(done_t[j * ssb : (j + 1) * ssb])
        bit_j = ((bits >> j) & 1) > 0
        runs.append(in_count & bit_j & (near_k < cutoff_j))
    any_run = functools.reduce(jnp.logical_or, runs)

    @pl.when(any_run)
    def _():
        nv_ref[0] = nv_ref[0] + 1

    for j in range(sub_g):
        @pl.when(runs[j])
        def _(j=j):
            rj = rays[j * ssb : (j + 1) * ssb]  # (ssb, 16)
            t = _PRIM_ROWS[prim](rj, w, t_min)  # (ssb, BLOCK)
            c_min = jnp.min(t, axis=1, keepdims=True)  # (ssb, 1)
            c_idx = jnp.min(
                jnp.where(t <= c_min, pid, _BIG_I), axis=1, keepdims=True
            )
            btj = bt[j * ssb : (j + 1) * ssb]
            better = c_min < btj
            bt_ref[0, j * ssb : (j + 1) * ssb] = jnp.where(
                better, c_min, btj
            )
            bi_ref[0, j * ssb : (j + 1) * ssb] = jnp.where(
                better, c_idx, bi_ref[0, j * ssb : (j + 1) * ssb]
            )


def _trans_kernel(
    counts_ref, cand_ref, nearb_ref, sub_ref,
    rays_ref,  # (1, 16, SB); row 8 = per-ray t_max, row 9 = live
    slab_ref,  # (1, 16, BLOCK); row 15 = per-prim shadow factor
    tr_ref,  # (1, SB, 1) transmittance, resident across k
    nv_ref,  # (1, 1, 1)
    rsc_ref,  # (SB, 16) VMEM scratch: rays transposed once per tile
    *, block, t_min, prim, sub_g,
):
    s = pl.program_id(0)
    k = pl.program_id(1)
    sb = rays_ref.shape[2]
    ssb = sb // sub_g

    @pl.when(k == 0)
    def _():
        tr_ref[0] = jnp.ones((sb, 1), jnp.float32)
        nv_ref[0] = jnp.zeros((1, 1), jnp.int32)
        rsc_ref[...] = rays_ref[0].T  # once per tile (see _closest_kernel)

    rays = rsc_ref[...]  # (SB, 16)
    live = rays[:, 9:10] > 0.0
    tr = tr_ref[0]
    # Occlusion has no distance order: visit every masked-in candidate,
    # but each sub-bundle stops once all its live rays are extinguished.
    lit = jnp.where(live, tr, 0.0)  # (SB, 1)
    in_count = k < counts_ref[s]
    w = slab_ref[0]

    if sub_g == 1:
        # Whole-tile body (the round-3 kernel, known-good on hardware).
        run = in_count & (jnp.max(lit) > 1e-6)

        @pl.when(run)
        def _():
            t = _PRIM_ROWS[prim](rays, w, t_min)
            occ = t < rays[:, 8:9]
            f = jnp.where(occ, w[15:16, :], 1.0)
            # Lane product via exp(sum(log)): Mosaic has no reduce_prod
            # lowering on this path.  Exact at the boundaries (log(0) =
            # -inf -> exp = 0; log(1) = 0) and f in [0, 1].
            logf = jnp.log(jnp.maximum(f, 0.0))
            tr_ref[0] = tr * jnp.exp(
                jnp.sum(logf, axis=1, keepdims=True)
            )
            nv_ref[0] = nv_ref[0] + 1
        return

    bits = sub_ref[s, k]
    runs = []
    for j in range(sub_g):
        any_light_j = jnp.max(lit[j * ssb : (j + 1) * ssb]) > 1e-6
        bit_j = ((bits >> j) & 1) > 0
        runs.append(in_count & bit_j & any_light_j)
    any_run = functools.reduce(jnp.logical_or, runs)

    @pl.when(any_run)
    def _():
        nv_ref[0] = nv_ref[0] + 1

    for j in range(sub_g):
        @pl.when(runs[j])
        def _(j=j):
            rj = rays[j * ssb : (j + 1) * ssb]
            t = _PRIM_ROWS[prim](rj, w, t_min)  # (ssb, BLOCK)
            occ = t < rj[:, 8:9]
            f = jnp.where(occ, w[15:16, :], 1.0)
            logf = jnp.log(jnp.maximum(f, 0.0))
            tr_ref[0, j * ssb : (j + 1) * ssb] = tr[
                j * ssb : (j + 1) * ssb
            ] * jnp.exp(jnp.sum(logf, axis=1, keepdims=True))


def _sweep_call(kernel, packed, rays_t, cand, counts, nearb, submask,
                t_min, n_out, interpret, prim, sub_g):
    s_tiles, k_max = cand.shape
    sb = rays_t.shape[2]
    block = packed.shape[2]

    def slab_index(s, k, counts, cand, nearb, sub):
        # Clamp exhausted tiles to their last candidate: consecutive
        # equal block indices make the pipeline skip the re-copy.
        kc = jnp.minimum(k, jnp.maximum(counts[s] - 1, 0))
        return cand[s, kc], 0, 0

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(s_tiles, k_max),
        in_specs=[
            pl.BlockSpec((1, 16, sb), lambda s, k, *_: (s, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 16, block), slab_index,
                         memory_space=pltpu.VMEM),
        ],
        out_specs=tuple(
            [pl.BlockSpec((1, sb, 1), lambda s, k, *_: (s, 0, 0),
                          memory_space=pltpu.VMEM)] * n_out
        ) + (pl.BlockSpec((1, 1, 1), lambda s, k, *_: (s, 0, 0),
                          memory_space=pltpu.VMEM),),
        scratch_shapes=[pltpu.VMEM((sb, 16), jnp.float32)],
    )
    val_dtypes = [jnp.float32, jnp.int32][:n_out]
    out_shape = tuple(
        jax.ShapeDtypeStruct((s_tiles, sb, 1), dt) for dt in val_dtypes
    ) + (jax.ShapeDtypeStruct((s_tiles, 1, 1), jnp.int32),)
    return pl.pallas_call(
        functools.partial(kernel, block=block, t_min=t_min, prim=prim,
                          sub_g=sub_g),
        grid_spec=grid_spec,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(counts, cand, nearb, submask, rays_t, packed)


def _chunked(fn, args_per_tile, s_tiles, chunk):
    """Run ``fn`` over tile chunks via lax.map (one compile, small
    scalar-prefetch SMEM footprint per call)."""
    if s_tiles <= chunk:
        return fn(*args_per_tile)
    pad = (-s_tiles) % chunk
    if pad:
        args_per_tile = [
            jnp.pad(a, ((0, pad),) + ((0, 0),) * (a.ndim - 1))
            for a in args_per_tile
        ]
    n = (s_tiles + pad) // chunk
    stacked = [
        a.reshape((n, chunk) + a.shape[1:]) for a in args_per_tile
    ]
    outs = jax.lax.map(lambda xs: fn(*xs), tuple(stacked))
    outs = jax.tree_util.tree_map(
        lambda o: o.reshape((n * chunk,) + o.shape[2:])[:s_tiles], outs
    )
    return outs


def _resolve_submask(submask, cand, sub_g):
    if submask is None:
        assert sub_g == 1, "sub_g > 1 requires a submask"
        return jnp.full(cand.shape, (1 << sub_g) - 1, jnp.int32)
    return submask.astype(jnp.int32)


def _default_interpret(interpret):
    """SOLR_PALLAS_INTERPRET=1 forces interpret mode so the FULL
    traversal ladder (escalation fori_loop + nets) can run through the
    Pallas kernels on CPU CI — hardware-free coverage of the exact
    code path the TPU executes (the smoke test remains the hardware
    gate)."""
    if interpret is None:
        import os

        return bool(os.environ.get("SOLR_PALLAS_INTERPRET"))
    return interpret


def sweep_closest(packed, rays_t, cand, counts, near_bound, t_min,
                  interpret=None, chunk: int = TILE_CHUNK,
                  prim: str = "tri", submask=None, sub_g: int = 1):
    """Closest hit over per-tile candidate blocks.

    packed (NB, 16, BLOCK) Woop slabs (solr_tpu.ops.packet.block_pack);
    rays_t (S, 16, SB) from :func:`make_rays16t`; cand (S, K) block ids
    nearest-first; counts (S,); near_bound (S, K+1) per-candidate
    distance lower bounds (the +FAR sentinel column is unused but kept
    for parity with two_level_select's output); submask (S, K) int32
    per-sub-bundle need bits (solr_tpu.ops.packet.subbundle_bits) with
    ``sub_g`` sub-bundles per tile (None -> whole-tile sweep).

    Returns (t (S, SB), prim idx (S, SB) with -1 = miss,
    visits (S,) candidate blocks intersected by >= 1 sub-bundle).
    """
    interpret = _default_interpret(interpret)
    s_tiles = cand.shape[0]
    nearb = near_bound[:, : cand.shape[1]]
    submask = _resolve_submask(submask, cand, sub_g)

    def one(rays_t, cand, counts, nearb, submask):
        return _sweep_call(
            _closest_kernel, packed, rays_t, cand, counts, nearb,
            submask, t_min, 2, interpret, prim, sub_g,
        )

    bt, bi, nv = _chunked(
        one, [rays_t, cand, counts, nearb, submask], s_tiles, chunk
    )
    sb = rays_t.shape[2]
    bi = bi.reshape(s_tiles, sb)
    bi = jnp.where(bi == _BIG_I, -1, bi)
    return bt.reshape(s_tiles, sb), bi, nv.reshape(s_tiles)


def sweep_transmittance(packed, rays_t, cand, counts, t_min,
                        interpret=None, chunk: int = TILE_CHUNK,
                        prim: str = "tri", submask=None, sub_g: int = 1):
    """Shadow transmittance over per-tile candidate blocks: (tr (S, SB)
    in [0, 1], visits (S,)).  Per-ray t_max rides in rays_t row 8."""
    interpret = _default_interpret(interpret)
    s_tiles, k_max = cand.shape
    nearb = jnp.zeros((s_tiles, k_max), jnp.float32)
    submask = _resolve_submask(submask, cand, sub_g)

    def one(rays_t, cand, counts, nearb, submask):
        return _sweep_call(
            _trans_kernel, packed, rays_t, cand, counts, nearb,
            submask, t_min, 1, interpret, prim, sub_g,
        )

    tr, nv = _chunked(
        one, [rays_t, cand, counts, nearb, submask], s_tiles, chunk
    )
    sb = rays_t.shape[2]
    return tr.reshape(s_tiles, sb), nv.reshape(s_tiles)
