#!/usr/bin/env python
"""Standalone sweep-kernel probe: compile + runtime at bench-like
shapes, parameterized over the tuning axes (sub-bundle count G, tile
chunk S, candidate cap K, rays/tile SB), WITHOUT building a scene.

Used to answer, per hardware generation, the questions the bench can't
isolate: what does one grid step cost, what does sub-bundle masking
save at a given mask density, and how long does the kernel compile
cold.  Results feed DEBUGGING.md.

    python tools/probe_sweep.py --g 1 --k 32
    python tools/probe_sweep.py --g 8 --k 32 --density 0.3

Prints one JSON line per run.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/solr_jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--g", type=int, default=1, help="sub-bundles/tile")
    ap.add_argument("--s", type=int, default=256, help="tiles")
    ap.add_argument("--sb", type=int, default=256, help="rays/tile")
    ap.add_argument("--k", type=int, default=32, help="candidates/tile")
    ap.add_argument("--nb", type=int, default=512, help="total blocks")
    ap.add_argument("--density", type=float, default=1.0,
                    help="fraction of sub-bundle bits set")
    ap.add_argument("--kernel", default="closest",
                    choices=["closest", "trans"])
    ap.add_argument("--repeats", type=int, default=5)
    args = ap.parse_args()

    from solr_tpu.ops.pallas_kernels import (
        make_rays16t, sweep_closest, sweep_transmittance,
    )

    rng = np.random.default_rng(0)
    packed = jnp.asarray(
        rng.normal(size=(args.nb, 16, 256)).astype(np.float32)
    )
    o = jnp.asarray(rng.normal(size=(args.s, args.sb, 3)).astype(np.float32))
    d = jnp.asarray(rng.normal(size=(args.s, args.sb, 3)).astype(np.float32))
    rays = make_rays16t(o, d)
    cand = jnp.asarray(
        rng.integers(0, args.nb, (args.s, args.k)).astype(np.int32)
    )
    counts = jnp.full((args.s,), args.k, jnp.int32)
    nearb = jnp.zeros((args.s, args.k + 1), jnp.float32)
    if args.g > 1:
        bits_np = (
            rng.uniform(size=(args.s, args.k, args.g)) < args.density
        ).astype(np.int32)
        sub = jnp.asarray(
            (bits_np << np.arange(args.g)).sum(-1).astype(np.int32)
        )
    else:
        sub = None

    if args.kernel == "closest":
        fn = jax.jit(lambda r, c, n, nb: sweep_closest(
            packed, r, c, n, nb, 1e-4, submask=sub, sub_g=args.g
        )[0])
    else:
        fn = jax.jit(lambda r, c, n, nb: sweep_transmittance(
            packed, r, c, n, 1e-4, submask=sub, sub_g=args.g
        )[0])

    t0 = time.time()
    out = fn(rays, cand, counts, nearb)
    float(np.asarray(out).sum())
    compile_s = time.time() - t0
    best = float("inf")
    for _ in range(args.repeats):
        t0 = time.time()
        float(np.asarray(fn(rays, cand, counts, nearb).sum()))
        best = min(best, time.time() - t0)
    steps = args.s * args.k
    print(json.dumps({
        "kernel": args.kernel, "g": args.g, "s": args.s, "sb": args.sb,
        "k": args.k, "density": args.density,
        "compile_s": round(compile_s, 1),
        "run_ms": round(best * 1000, 2),
        "us_per_step": round(best / steps * 1e6, 3),
        "device": str(jax.devices()[0]),
    }))


if __name__ == "__main__":
    main()
