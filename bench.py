"""Headline benchmark: rays/s/chip, primary+secondary, on a BVH triangle
scene (BASELINE.json north-star: >= 1 Grays/s/chip on 1M tris).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
Detailed per-attempt records (roofline, packet diagnostics, fallbacks)
are appended to bench_metrics.jsonl next to this file (SURVEY.md §5
observability; VERDICT r02 weak #7).

Ray accounting (matches the north-star's "primary + secondary
(reflection/refraction/shadow) rays"): every bounce traces 1 closest-hit
ray per pixel plus 1 shadow ray per light per pixel, so
    rays/frame = n_pixels * max_bounces * (1 + n_lights).
This is the work the kernel actually performs (dead rays still occupy
lanes until compaction lands), identical to how the reference's per-pixel
loop counts (SURVEY.md section 3.3).

Adversarial two-path protocol (VERDICT r03 missing #2: round 3's 176x
regression shipped silently because the ladder stopped at the first
"success"):
  1. BOTH the Pallas sweep AND the SOLR_NO_PALLAS XLA block path run at
     headline scale; the summary line leads with the FASTER one and
     carries both under "paths".
  2. The best previous round's number (BENCH_r*.json next to this file)
     is the floor: "regression_vs_best_prev" is nonzero iff this round's
     best is below it — a silent regression is now a loud one.
  3. Only if both paths fail at headline scale does the ladder shrink
     the scene (N/5, N/20).

Each attempt runs in its OWN subprocess: a TPU worker crash ("UNAVAILABLE:
TPU worker process crashed") kills the JAX client for the whole process,
so an in-process ladder would report the first crash six times (observed
in round 3's first run) — isolation is what makes the ladder real.
"""

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax

# Remote (tunneled) TPU compiles run 3-8 min; the persistent cache makes
# repeat benches start in seconds.
jax.config.update("jax_compilation_cache_dir", "/tmp/solr_jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

# Best measured sweep config at the headline scale (round-4 sweep:
# BLOCK=512 at 992 ms/frame vs 1113 ms at BLOCK=256; PERF.md).  Must be
# set before solr_tpu.ops.packet is first imported.
os.environ.setdefault("SOLR_PACKET_BLOCK", "512")

N_TRIS = int(os.environ.get("SOLR_BENCH_TRIS", 1_000_000))
WIDTH = int(os.environ.get("SOLR_BENCH_WIDTH", 512))
HEIGHT = int(os.environ.get("SOLR_BENCH_HEIGHT", 512))
BOUNCES = int(os.environ.get("SOLR_BENCH_BOUNCES", 2))
REPEATS = int(os.environ.get("SOLR_BENCH_REPEATS", 3))
BASELINE_RAYS_PER_S = 1.0e9  # north-star: 1 Grays/s/chip
_METRICS_PATH = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "bench_metrics.jsonl"
)


def build_scene():
    import numpy as np
    import solr_tpu as st

    rng = np.random.default_rng(42)
    b = st.SceneBuilder()
    terrain = b.add_material(color=(0.55, 0.5, 0.4, 1.0), specular=0.2)
    mirror = b.add_material(color=(0.9, 0.9, 0.9, 1.0), reflection=0.6,
                            specular=0.8)

    # Tessellated terrain heightfield of ~N_TRIS triangles: a realistic
    # high-poly surface (every pixel hits geometry; traversal touches a
    # localized leaf set, unlike a volumetric triangle soup).
    gw = int(np.sqrt(N_TRIS / 2.0))
    gh = max(N_TRIS // (2 * gw), 1)
    extent = 40.0
    xs = np.linspace(-extent, extent, gw + 1, dtype=np.float32)
    zs = np.linspace(5.0, 5.0 + 2 * extent, gh + 1, dtype=np.float32)
    xg, zg = np.meshgrid(xs, zs)
    yg = (
        2.0 * np.sin(xg * 0.25) * np.cos(zg * 0.25)
        + 0.7 * np.sin(xg * 1.1 + 2.0) * np.cos(zg * 0.9)
        + 0.25 * np.sin(xg * 3.7) * np.sin(zg * 4.1)
        - 4.0
    ).astype(np.float32)
    verts = np.stack([xg, yg, zg], axis=-1).reshape(-1, 3)
    idx = np.arange((gh + 1) * (gw + 1)).reshape(gh + 1, gw + 1)
    q00 = idx[:-1, :-1].reshape(-1)
    q10 = idx[:-1, 1:].reshape(-1)
    q01 = idx[1:, :-1].reshape(-1)
    q11 = idx[1:, 1:].reshape(-1)
    faces = np.concatenate(
        [
            np.stack([q00, q10, q11], axis=-1),
            np.stack([q00, q11, q01], axis=-1),
        ]
    )
    b.add_mesh(verts, faces, terrain)

    # Mirror spheres scattered on the terrain: secondary-ray workload.
    for i in range(24):
        x = rng.uniform(-extent * 0.8, extent * 0.8)
        z = rng.uniform(10.0, 5.0 + 1.8 * extent)
        b.add_sphere((x, -1.5, z), rng.uniform(0.8, 2.0), mirror)
    b.add_light((0.0, extent, 10.0), intensity=1.0)
    scene = b.build(bvh_threshold=64)
    cam = st.Camera.create(
        position=(0.0, 2.0, -4.0), angles=(0.25, 0.0, 0.0), fov=1.0
    )
    cfg = st.RenderConfig(
        width=WIDTH, height=HEIGHT, max_bounces=BOUNCES,
        gradient_background=True,
        packet_tile_w=int(os.environ.get("SOLR_BENCH_TILE_W", 16)),
        packet_tile_h=int(os.environ.get("SOLR_BENCH_TILE_H", 16)),
        # Per-strip interval list width K and tile prefilter width Kt
        # (round-5 strip-interval traversal).  K=64 holds every
        # measured strip list (probe_intervals: strip union max 42 at
        # 200k tris) so the exactness net never fires; Kt bounds the
        # per-ray slab matrices and exceeds the measured max tile
        # candidate count (96).
        packet_max_blocks=int(os.environ.get("SOLR_BENCH_K", 64)),
        packet_tile_cand=int(os.environ.get("SOLR_BENCH_KT", 256)),
        # "auto" (packet), "while" (per-ray skip-pointer walk — round
        # 1's 4.8 Mrays/s path), or "packet".
        traversal=os.environ.get("SOLR_BENCH_TRAVERSAL", "auto"),
    )
    return scene, cam, cfg


def packet_diagnostics(scene, cam, cfg):
    """Primary-bounce packet stats for the strip-interval traversal:
    per-strip list lengths, per-strip kernel visits, PER-RAY visits
    (the VERDICT r04 item-1 "done" metric: <= 5), and the exactness-net
    ray rate (THE metric whose absence hid the round-2 collapse)."""
    import jax.numpy as jnp
    import numpy as np

    from solr_tpu.constants import T_FAR
    from solr_tpu.ops import packet as pk
    from solr_tpu.ops.camera import camera_rays
    from solr_tpu.ops.traverse import _use_pallas

    accel = scene.tri_accel
    sb = cfg.packet_rays
    ks, kt = cfg.packet_max_blocks, cfg.packet_tile_cand

    @jax.jit
    def stats(scene, cam):
        o, d = camera_rays(cam, cfg)
        perm, _ = pk.tile_permutation(
            cfg.width, cfg.height, cfg.packet_tile_w, cfg.packet_tile_h
        )
        o_t = o[perm].reshape(-1, sb, 3)
        d_t = d[perm].reshape(-1, sb, 3)
        live = jnp.ones(o_t.shape[:2], bool)
        cand, counts, nearb, dropped = pk.strip_interval_select(
            o_t, d_t, live, accel, kt, ks, 1e-4
        )
        g = cand.shape[1]
        real = accel.block_bounds[:, 0] < 1e29
        bmin = jnp.min(jnp.where(
            real[:, None],
            accel.block_bounds[:, 0:3] - accel.block_bounds[:, 3:6],
            jnp.inf), axis=0)
        bmax = jnp.max(jnp.where(
            real[:, None],
            accel.block_bounds[:, 0:3] + accel.block_bounds[:, 3:6],
            -jnp.inf), axis=0)
        t_cap = pk.ray_box_exit(o_t, d_t, bmin, bmax)
        if _use_pallas():
            from solr_tpu.ops.pallas_kernels import (
                make_rays16t, sweep_closest,
            )

            rays_t = make_rays16t(o_t, d_t, tmax_t=t_cap)
            bt, _bi, nv = sweep_closest(
                accel.packed, rays_t, cand, counts, nearb, 1e-4
            )
            strip_visits = nv.astype(jnp.float32) / g
        else:
            ssb = sb // g
            bt, _bi = pk.tri_blocks_closest(
                accel.packed,
                o_t.reshape(-1, ssb, 3), d_t.reshape(-1, ssb, 3),
                cand.reshape(-1, cand.shape[2]), counts.reshape(-1),
                1e-4,
            )
            bt = bt.reshape(-1, sb)
            strip_visits = counts.astype(jnp.float32).mean(axis=1)
        done = jnp.minimum(bt, t_cap)  # (S, SB)
        net = done > dropped
        # PER-RAY visits: blocks of the ray's own interval list a
        # front-to-back walk would intersect (entry <= done) — the
        # item the whole round-5 selection exists to minimize.
        bbg = jnp.take(accel.block_bounds, cand.reshape(-1, cand.shape[2]),
                       axis=0).reshape(cand.shape + (8,))
        per_strip = bbg.reshape(-1, cand.shape[2], 8)
        o_s = o_t.reshape(per_strip.shape[0], -1, 3)
        d_s = d_t.reshape(per_strip.shape[0], -1, 3)
        entry, hitm = pk.slab_entries_g(o_s, d_s, per_strip, 1e-4)
        k_valid = (
            jnp.arange(cand.shape[2])[None, None, :]
            < counts.reshape(-1, 1, 1)
        )
        ray_visits = jnp.sum(
            hitm & k_valid
            & (entry <= done.reshape(entry.shape[0], -1)[..., None]),
            axis=-1,
        )
        return (
            jnp.mean(counts.astype(jnp.float32)),
            jnp.max(counts),
            jnp.mean(strip_visits),
            jnp.mean(ray_visits.astype(jnp.float32)),
            jnp.mean(net.astype(jnp.float32)),
            jnp.mean((dropped < T_FAR * 0.5).astype(jnp.float32)),
        )

    (mean_cand, max_cand, strip_visits, ray_visits, net_rate,
     drop_rate) = [
        float(x) for x in jax.device_get(stats(scene, cam))
    ]
    return {
        "blocks": int(accel.packed.shape[0]),
        "strips_per_tile": int(pk.strips_per_tile(sb)),
        "mean_strip_candidates": round(mean_cand, 2),
        "max_strip_candidates": int(max_cand),
        "mean_strip_visits": round(strip_visits, 2),
        "mean_visits": round(ray_visits, 2),
        "net_ray_rate": round(net_rate, 5),
        "strip_drop_rate": round(drop_rate, 4),
    }


def bytes_by_phase(scene, cam, cfg):
    """XLA cost-analysis bytes_accessed per traversal phase (VERDICT
    r04 missing #2: the byte diet needs the budget itemized by the
    bench itself, not a one-off tool).  Pallas custom calls report
    their operand bytes; the XLA select/shade glue is the remainder vs
    the frame roofline."""
    import jax.numpy as jnp

    from solr_tpu.constants import RAY_EPS
    from solr_tpu.ops import packet as pk
    from solr_tpu.ops.camera import camera_rays
    from solr_tpu.ops.traverse import (
        _tri_packet_closest, _tri_packet_transmittance,
    )
    from solr_tpu.utils.profiling import cost_summary

    accel = scene.tri_accel
    sb = cfg.packet_rays
    spec = cfg.packet_spec()
    o, d = camera_rays(cam, cfg)
    perm, _ = pk.tile_permutation(
        cfg.width, cfg.height, cfg.packet_tile_w, cfg.packet_tile_h
    )
    o_p, d_p = o[perm], d[perm]
    o_t = o_p.reshape(-1, sb, 3)
    d_t = d_p.reshape(-1, sb, 3)
    live = jnp.ones(o_t.shape[:2], bool)

    def select(o_t, d_t):
        return pk.strip_interval_select(
            o_t, d_t, live, accel, cfg.packet_tile_cand,
            cfg.packet_max_blocks, RAY_EPS,
        )[0]

    def closest(o_p, d_p):
        return _tri_packet_closest(scene, o_p, d_p, RAY_EPS, spec)[0]

    lpos = scene.lights.position[0]

    def shadow(o_p, d_p):
        to_l = lpos[None, :] - o_p
        dist = jnp.sqrt(jnp.maximum(jnp.sum(to_l * to_l, -1), 1e-12))
        return _tri_packet_transmittance(
            scene, o_p, to_l / dist[:, None], dist - RAY_EPS, RAY_EPS,
            spec,
        )

    out = {}
    for name, fn in (("select", select), ("closest", closest),
                     ("shadow", shadow)):
        c = cost_summary(fn, o_p if name != "select" else o_t,
                         d_p if name != "select" else d_t)
        out[name] = round(c["bytes_accessed"] / 1e9, 3)
    return out


def _run(n_tris, metrics):
    """Returns the result dict, or raises on device failure."""
    global N_TRIS
    N_TRIS = n_tris

    import jax
    import jax.numpy as jnp
    import numpy as np

    from solr_tpu.ops.render import render_sample
    from solr_tpu.utils.profiling import cost_summary

    t0 = time.time()
    scene, cam, cfg = build_scene()
    build_s = time.time() - t0

    # Digest to a scalar on-device: forces the full render but keeps the
    # host transfer tiny.  NB block_until_ready does NOT reliably block
    # under tunneled backends — np.asarray of the digest is the honest
    # synchronization.
    def frame(scene, cam):
        img, _ = render_sample(scene, cam, cfg)
        return jnp.sum(img)

    fn = jax.jit(frame)
    t0 = time.time()
    digest = float(np.asarray(fn(scene, cam)))
    compile_s = time.time() - t0
    assert np.isfinite(digest)
    # The two-path protocol compares digests across Pallas/XLA runs in
    # main() — a free on-hardware correctness check (same algorithm,
    # two execution paths).
    digest_val = digest

    best = float("inf")
    for _ in range(REPEATS):
        t0 = time.time()
        float(np.asarray(fn(scene, cam)))
        best = min(best, time.time() - t0)

    n_lights = scene.lights.position.shape[0]
    rays = cfg.n_pixels * cfg.max_bounces * (1 + n_lights)
    rays_per_s = rays / best
    result = {
        "metric": (
            f"rays/s/chip primary+secondary, {n_tris} tris, "
            f"{WIDTH}x{HEIGHT}x{BOUNCES}b BVH"
        ),
        "value": round(rays_per_s, 1),
        "unit": "rays/s",
        "vs_baseline": round(rays_per_s / BASELINE_RAYS_PER_S, 6),
        "frame_ms": round(best * 1000, 2),
        "compile_s": round(compile_s, 1),
        "scene_build_s": round(build_s, 1),
        "pallas": not os.environ.get("SOLR_NO_PALLAS"),
        "device": str(jax.devices()[0]),
        "digest": digest_val,
    }

    # Roofline + packet diagnostics: observability, never fatal — and
    # SKIPPED when the frame compile already ate the attempt budget
    # (the remote compile helper degrades ~100x on some days,
    # DEBUGGING.md section 6; each extra jit is another cold compile).
    slow_day = compile_s > float(
        os.environ.get("SOLR_BENCH_EXTRAS_BUDGET", 600)
    )
    try:
        if slow_day:
            raise RuntimeError(
                f"skipped: frame compile took {compile_s:.0f}s"
            )
        cost = cost_summary(frame, scene, cam)
        result["roofline"] = {
            "flops": cost["flops"],
            "bytes_accessed": cost["bytes_accessed"],
            "bound": cost["bound"],
            "roofline_ms": round(cost["roofline_s"] * 1000, 3),
            # XLA cost analysis sums BOTH branches of every lax.cond,
            # so on a program with conditional exactness-net fallbacks
            # these figures are upper bounds dominated by never-taken
            # branches (PERF.md round 5 — the honest per-phase bytes
            # are in bytes_by_phase_gb).
            "note": "upper bound: includes untaken lax.cond branches",
        }
    except Exception as e:  # pragma: no cover
        result["roofline"] = {"error": str(e)[:120]}
    try:
        if slow_day:
            raise RuntimeError(
                f"skipped: frame compile took {compile_s:.0f}s"
            )
        result["bytes_by_phase_gb"] = bytes_by_phase(scene, cam, cfg)
    except Exception as e:  # pragma: no cover
        result["bytes_by_phase_gb"] = {"error": str(e)[:120]}
    try:
        if slow_day:
            raise RuntimeError(
                f"skipped: frame compile took {compile_s:.0f}s"
            )
        result["packet"] = packet_diagnostics(scene, cam, cfg)
        # The round-3 collapse fired exactly here: a mis-sized net
        # quietly brute-forcing 14% of rays.  Make the assumption loud.
        if result["packet"].get("net_ray_rate", 0.0) > 0.02:
            result["packet"]["warning"] = (
                "net_ray_rate above the 2% design budget - raise "
                "packet_max_blocks / packet_tile_cand"
            )
    except Exception as e:  # pragma: no cover
        result["packet"] = {"error": str(e)[:120]}
    metrics.log(**result)
    return result


def _attempt_main():
    """Single attempt, in-process (invoked as `bench.py --attempt` by
    main's subprocess ladder).  Prints one JSON line on success."""
    from solr_tpu.utils.metrics import MetricsLogger

    metrics = MetricsLogger(_METRICS_PATH)
    result = _run(N_TRIS, metrics)
    result["fallback_xla"] = bool(os.environ.get("SOLR_NO_PALLAS"))
    metrics.close()
    print("SOLR_BENCH_RESULT " + json.dumps(result))


def _attempt_subprocess(n, fallback, timeout_s, metrics):
    """One isolated bench attempt; returns the result dict or None."""
    env = dict(os.environ, SOLR_BENCH_TRIS=str(n))
    if fallback:
        env["SOLR_NO_PALLAS"] = "1"
    else:
        env.pop("SOLR_NO_PALLAS", None)
    err = None
    try:
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--attempt"],
            env=env, capture_output=True, text=True, timeout=timeout_s,
        )
        for line in proc.stdout.splitlines():
            if line.startswith("SOLR_BENCH_RESULT "):
                return json.loads(line[len("SOLR_BENCH_RESULT "):])
        err = f"exit {proc.returncode}: " + proc.stderr.strip()[-500:]
    except subprocess.TimeoutExpired:
        err = f"attempt timed out after {timeout_s}s"
    metrics.log(event="bench_attempt_failed", n_tris=n,
                fallback_xla=fallback, error=str(err)[:600])
    return None


def _best_previous():
    """Best headline rays/s recorded by ANY previous round's driver
    snapshot (BENCH_r*.json) — the regression floor."""
    import glob

    best = 0.0
    here = os.path.dirname(os.path.abspath(__file__))
    for path in glob.glob(os.path.join(here, "BENCH_r*.json")):
        try:
            with open(path) as f:
                rec = json.load(f)
            parsed = rec.get("parsed", rec)
            if parsed.get("unit") == "rays/s":
                best = max(best, float(parsed.get("value", 0.0)))
        except Exception:
            continue
    return best


def main():
    from solr_tpu.utils.metrics import MetricsLogger

    metrics = MetricsLogger(_METRICS_PATH)
    attempt_cap = int(os.environ.get("SOLR_BENCH_ATTEMPT_TIMEOUT", 2400))
    total_cap = int(os.environ.get("SOLR_BENCH_TOTAL_TIMEOUT", 5400))
    t_start = time.time()

    def remaining():
        return total_cap - (time.time() - t_start)

    # Phase 1: BOTH paths at headline scale.
    paths = {}
    for fallback in (False, True):
        if remaining() < 120:
            break
        timeout_s = int(min(attempt_cap, remaining()))
        res = _attempt_subprocess(N_TRIS, fallback, timeout_s, metrics)
        if res is not None:
            paths["xla" if fallback else "pallas"] = res

    result = None
    if paths:
        result = dict(max(paths.values(), key=lambda r: r["value"]))
        result["paths"] = {
            name: {k: r[k] for k in
                   ("value", "frame_ms", "compile_s", "digest") if k in r}
            for name, r in paths.items()
        }
        # Cross-path digest agreement = on-hardware correctness check
        # (identical algorithm through two execution paths).
        if len(paths) == 2:
            d = [r.get("digest") for r in paths.values()]
            if all(x is not None for x in d) and abs(d[0]) > 1e-9:
                rel = abs(d[0] - d[1]) / abs(d[0])
                result["path_digest_rel_diff"] = round(rel, 6)
                if rel > 1e-3:
                    result["warning"] = (
                        "pallas/xla digests disagree beyond 1e-3"
                    )
    else:
        # Phase 2: degradation ladder at reduced scale.
        for n in (N_TRIS // 5, N_TRIS // 20):
            for fallback in (False, True):
                if remaining() < 120:
                    break
                timeout_s = int(min(attempt_cap, remaining()))
                result = _attempt_subprocess(
                    n, fallback, timeout_s, metrics
                )
                if result is not None:
                    break
            if result is not None:
                break
    if result is None:
        result = {
            "metric": "bench failed at all scales",
            "value": 0.0,
            "unit": "rays/s",
            "vs_baseline": 0.0,
            "error": "all attempts failed (see bench_metrics.jsonl)",
        }
    # Regression guard (VERDICT r03 missing #2): nonzero iff this run's
    # best is below the best previously recorded round.
    prev = _best_previous()
    result["best_prev_rays_s"] = round(prev, 1)
    short = result["value"] < prev
    result["regression_vs_best_prev"] = (
        round(1.0 - result["value"] / prev, 4) if (short and prev) else 0
    )
    metrics.log(event="bench_summary", **{
        k: v for k, v in result.items() if not isinstance(v, dict)
    })
    metrics.close()
    print(json.dumps(result))


if __name__ == "__main__":
    if "--attempt" in sys.argv:
        _attempt_main()
    else:
        main()
