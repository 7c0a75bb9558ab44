"""Prove (or refute) the reduce-scatter/backward overlap claim from the
COMPILER SCHEDULE, not an assertion (VERDICT r02 weak #6).

AOT-compiles the ZeRO-1 reduce-scatter train step for an 8-chip v5e
topology (jax.experimental.topologies — no real slice needed, the same
XLA:TPU compiler the hardware uses) and inspects the optimized HLO: an
overlapped collective appears as an async `*-start` / `*-done` pair
with real compute scheduled between them; a blocking one has the pair
adjacent.  Writes the evidence summary to stdout; OVERLAP.md commits
the conclusion.

Run (anywhere with the TPU compiler available):
    python tools/aot_overlap_check.py
"""

import os
import re
import sys

repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, repo)

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/solr_jax_cache_tpu")

import numpy as np
import optax


def main():
    from jax.experimental import topologies

    import __graft_entry__ as g
    import solr_tpu as st
    from solr_tpu.parallel import (
        init_zero_opt_state, make_mesh, make_sharded_train_step,
    )

    topo = topologies.get_topology_desc("v5e:2x4", "tpu")
    mesh = make_mesh(devices=np.asarray(topo.devices))
    print(f"AOT topology: {len(topo.devices)} x v5e")

    n_tris = int(os.environ.get("SOLR_AOT_TRIS", "96"))
    scene = g._flagship_builder(n_extra_tris=n_tris).build(bvh_threshold=64)
    camera = st.Camera.create(position=(0.0, 0.0, -1.6), fov=1.1)
    cfg = st.RenderConfig(width=32, height=32, max_bounces=2,
                          packet_tile_w=16, packet_tile_h=2)
    opt = optax.adam(1e-2)
    step, _ = make_sharded_train_step(
        scene, camera, cfg, mesh, opt, grad_reduce="reduce_scatter"
    )

    import jax.numpy as jnp

    params = scene.params
    from solr_tpu.parallel.grads import flatten_params

    flat, _ = flatten_params(params, len(topo.devices))
    # ZeRO state: moments are GLOBAL flat-vector shapes, sharded by the
    # step's in_specs (1/N per device).
    opt_state = jax.eval_shape(opt.init, flat)
    target = jax.ShapeDtypeStruct((32, 32, 3), jnp.float32)
    params_s = jax.eval_shape(lambda: params)

    lowered = step.lower(params_s, opt_state, target)
    compiled = lowered.compile()
    hlo = compiled.as_text()
    analyze(hlo)


def analyze(hlo: str):
    lines = hlo.splitlines()
    starts = {}
    evidence = []
    pat = re.compile(
        r"(\S+)\s*=.*?(reduce-scatter|all-gather|all-reduce|"
        r"collective-permute)(-start)?\(")
    for i, ln in enumerate(lines):
        m = pat.search(ln)
        if not m:
            continue
        name, kind, start = m.group(1), m.group(2), m.group(3)
        if start:
            starts[name.replace("-start", "")] = (i, kind)
    n_async = 0
    for i, ln in enumerate(lines):
        m = re.search(r"=\s*\S*\s*(\S+?)-done\((\S+?)[,)]", ln)
        if not m:
            continue
        base = m.group(2).rstrip(")")
        key = base.replace("-start", "")
        if key in starts:
            si, kind = starts[key]
            gap = [
                l for l in lines[si + 1 : i]
                if re.search(r"=\s*(f32|bf16|s32)\[", l)
                and "-done" not in l and "-start" not in l
            ]
            n_async += 1
            evidence.append(
                f"{kind}: start line {si} -> done line {i}; "
                f"{len(gap)} compute ops scheduled in between"
            )
    print(f"async collective start/done pairs: {n_async}")
    for e in evidence[:10]:
        print(" ", e)
    if not n_async:
        # Fall back: count any collective mentions.
        coll = [ln.strip()[:100] for ln in lines
                if re.search(r"reduce-scatter|all-gather|all-reduce", ln)]
        print("no async pairs found; collective ops present:")
        for c in coll[:10]:
            print(" ", c)


if __name__ == "__main__":
    main()
