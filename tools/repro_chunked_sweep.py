"""Minimal on-TPU repro for the 512-squared crash: sweep_closest over
1024 tiles (the lax.map chunked path) vs 256 tiles (single pallas_call).

Round-3 finding: 200k tris at 256x256 (256 tiles) runs, while BOTH 200k
and 1M tris at 512x512 (1024 tiles -> lax.map over 4 chunks) kill the
TPU worker ("UNAVAILABLE: TPU worker process crashed").  This script
isolates the kernel from the renderer so the failing construct can be
bisected: run with MODE=map|unroll|single TILES=N.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/solr_jax_cache_tpu")

from solr_tpu.ops import pallas_kernels as pkl

MODE = os.environ.get("MODE", "map")
TILES = int(os.environ.get("TILES", 1024))
NB = int(os.environ.get("NB", 782))
K = int(os.environ.get("K", 32))
SB = 256

rng = np.random.default_rng(0)
packed = jnp.asarray(rng.normal(size=(NB, 16, SB)).astype(np.float32))
o = rng.normal(size=(TILES, SB, 3)).astype(np.float32)
d = rng.normal(size=(TILES, SB, 3)).astype(np.float32)
d /= np.linalg.norm(d, axis=-1, keepdims=True)
rays_t = pkl.make_rays16t(jnp.asarray(o), jnp.asarray(d))
cand = jnp.asarray(
    rng.integers(0, NB, size=(TILES, K)).astype(np.int32)
)
counts = jnp.asarray(rng.integers(0, K + 1, size=(TILES,)).astype(np.int32))
nearb = jnp.zeros((TILES, K + 1), jnp.float32)

chunk = {"map": 256, "unroll": -256, "single": TILES}[MODE]


def run(packed, rays_t, cand, counts, nearb):
    if MODE == "unroll":
        outs = []
        for i in range(0, TILES, 256):
            outs.append(
                pkl.sweep_closest(
                    packed, rays_t[i : i + 256], cand[i : i + 256],
                    counts[i : i + 256], nearb[i : i + 256], 1e-4,
                )
            )
        return (
            jnp.concatenate([o[0] for o in outs]),
            jnp.concatenate([o[1] for o in outs]),
            jnp.concatenate([o[2] for o in outs]),
        )
    return pkl.sweep_closest(
        packed, rays_t, cand, counts, nearb, 1e-4, chunk=chunk
    )


t0 = time.time()
bt, bi, nv = jax.jit(run)(packed, rays_t, cand, counts, nearb)
bt_h = np.asarray(bt)
print(
    f"MODE={MODE} TILES={TILES} ok: compile+run {time.time()-t0:.1f}s "
    f"finite={np.isfinite(bt_h).all()} hits={(bt_h < 1e30).mean():.3f}"
)


if os.environ.get("TRANS"):
    tm = jnp.full((TILES, SB), 50.0, jnp.float32)
    rays_ts = pkl.make_rays16t(jnp.asarray(o), jnp.asarray(d), tmax_t=tm)
    t0 = time.time()
    tr, nv2 = jax.jit(
        lambda *a: pkl.sweep_transmittance(*a, 1e-4)
    )(packed, rays_ts, cand, counts)
    tr_h = np.asarray(tr)
    print(
        f"TRANS ok: {time.time()-t0:.1f}s finite={np.isfinite(tr_h).all()}"
    )
