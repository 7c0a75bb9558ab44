#!/usr/bin/env python
"""Standalone sweep-kernel probe: compile + runtime at bench-like
shapes, parameterized over the tuning axes (strips/tile G, tiles S,
per-strip candidate width K, rays/tile SB, block size), WITHOUT
building a scene.

Used to answer, per hardware generation, the questions the bench can't
isolate: what does one grid step cost with N strips running, what does
the per-strip early-out save at a given list-length distribution, and
how long does the kernel compile cold.  Results feed DEBUGGING.md /
PERF.md.

    python tools/probe_sweep.py --g 8 --k 64 --run-frac 1.0
    python tools/probe_sweep.py --g 8 --k 64 --run-frac 0.2

``--run-frac`` sets the fraction of (strip, k) slots that actually run
(via per-strip counts), emulating the measured list-length spread.

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
    ap.add_argument("--g", type=int, default=8, help="strips/tile")
    ap.add_argument("--s", type=int, default=256, help="tiles")
    ap.add_argument("--sb", type=int, default=256, help="rays/tile")
    ap.add_argument("--k", type=int, default=64,
                    help="per-strip candidate width")
    ap.add_argument("--nb", type=int, default=512, help="total blocks")
    ap.add_argument("--block", type=int, default=512, help="prims/block")
    ap.add_argument("--run-frac", type=float, default=1.0,
                    help="fraction of (strip, k) slots that run")
    ap.add_argument("--kernel", default="closest",
                    choices=["closest", "trans"])
    ap.add_argument("--repeats", type=int, default=5)
    args = ap.parse_args()

    from solr_tpu.ops.pallas_kernels import (
        make_rays16t, sweep_closest, sweep_transmittance,
    )

    rng = np.random.default_rng(0)
    packed = jnp.asarray(
        rng.normal(size=(args.nb, 16, args.block)).astype(np.float32)
    )
    o = jnp.asarray(rng.normal(size=(args.s, args.sb, 3)).astype(np.float32))
    d = jnp.asarray(rng.normal(size=(args.s, args.sb, 3)).astype(np.float32))
    rays = make_rays16t(o, d)
    g = args.g
    cand = jnp.asarray(
        rng.integers(0, args.nb, (args.s, g, args.k)).astype(np.int32)
    )
    counts = jnp.full(
        (args.s, g), max(1, int(round(args.k * args.run_frac))), jnp.int32
    )
    # Zero entry bounds: the early-out never fires (worst case) — the
    # probe measures the cost of RUNNING steps; run-frac models the
    # list-length distribution instead.
    nearb = jnp.zeros((args.s, g, args.k), jnp.float32)

    if args.kernel == "closest":
        fn = jax.jit(lambda r, c, n, nb: sweep_closest(
            packed, r, c, n, nb, 1e-4
        )[0])
    else:
        fn = jax.jit(lambda r, c, n, nb: sweep_transmittance(
            packed, r, c, n, 1e-4
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
    strip_runs = int(np.asarray(counts).sum())
    print(json.dumps({
        "kernel": args.kernel, "g": g, "s": args.s, "sb": args.sb,
        "k": args.k, "block": args.block, "run_frac": args.run_frac,
        "compile_s": round(compile_s, 1),
        "run_ms": round(best * 1000, 2),
        "us_per_step": round(best / steps * 1e6, 3),
        "us_per_strip_run": round(best / max(strip_runs, 1) * 1e6, 3),
        "device": str(jax.devices()[0]),
    }))


if __name__ == "__main__":
    main()
