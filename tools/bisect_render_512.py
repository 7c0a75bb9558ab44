"""Bisect the 512x512 full-render TPU worker crash by feature flags.

Usage: VARIANT=min|shadow|esc|full [TRIS=200000] python tools/bisect_render_512.py
  min    - sweep-only: no shadows, no escalation, no exactness net
  shadow - + shadow transmittance sweeps
  esc    - + cap-escalation second sweep
  full   - everything (the bench config)
"""

import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/solr_jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

import bench

bench.N_TRIS = int(os.environ.get("TRIS", 200000))
bench.WIDTH = 512
bench.HEIGHT = 512

scene, cam, cfg = bench.build_scene()
variant = os.environ.get("VARIANT", "min")
mods = {
    "min": dict(shadows=False, packet_exact=False,
                packet_escalate_blocks=0),
    "shadow": dict(packet_exact=False, packet_escalate_blocks=0),
    "esc": dict(packet_exact=False),
    "full": dict(),
}[variant]
cfg = dataclasses.replace(cfg, **mods)

from solr_tpu.ops.render import render_sample


def frame(scene, cam):
    img, _ = render_sample(scene, cam, cfg)
    return jnp.sum(img)


fn = jax.jit(frame)
t0 = time.time()
digest = float(np.asarray(fn(scene, cam)))
compile_s = time.time() - t0
t0 = time.time()
float(np.asarray(fn(scene, cam)))
run_s = time.time() - t0
print(
    f"VARIANT={variant} TRIS={bench.N_TRIS} ok: digest={digest:.4g} "
    f"compile={compile_s:.1f}s frame={run_s*1000:.1f}ms"
)
