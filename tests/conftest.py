"""Test configuration: CPU backend with 8 virtual devices.

Multi-chip code paths (Mesh/shard_map/collectives) run on
XLA-force-host-platform devices, the standard JAX trick for testing
distributed code without a TPU slice (SURVEY.md section 4 item 5).
A persistent compilation cache keeps repeat runs fast.
"""

import os

# SOLR_TPU_SMOKE=1 (tools/run_tpu_smoke.py) leaves the real TPU backend
# in place so tests/test_tpu_smoke.py runs on hardware; everything else
# gets the CPU pin + virtual 8-device mesh.
_TPU_SMOKE = bool(os.environ.get("SOLR_TPU_SMOKE"))

if not _TPU_SMOKE:
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()

import jax

if not _TPU_SMOKE:
    # The environment's sitecustomize force-registers the TPU backend and
    # overrides JAX_PLATFORMS; config.update is the reliable CPU pin.
    jax.config.update("jax_platforms", "cpu")
    # x64 enabled so gradient-vs-finite-difference checks can run in f64
    # (the 1e-3 BASELINE tolerance is unreachable in f32 FD).  Renderer
    # code derives dtypes from scene arrays, so f32 scenes still exercise
    # the f32 path.
    jax.config.update("jax_enable_x64", True)
    jax.config.update("jax_compilation_cache_dir", "/tmp/solr_tpu_jax_cache")
else:
    jax.config.update("jax_compilation_cache_dir", "/tmp/solr_jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(42)


@pytest.fixture
def key():
    return jax.random.PRNGKey(0)
