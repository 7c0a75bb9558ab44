"""Native C++ LBVH builder vs the NumPy reference builder.

The native path (solr_tpu/native/src/lbvh.cc) is the framework's analog
of the reference's host-side C++ acceleration build
(solr/engines/GPUKernel.cpp: compactBoxes); it must produce a tree
identical to the NumPy builder in solr_tpu/ops/bvh.py.
"""

import numpy as np
import numpy.testing as npt
import pytest

from solr_tpu import native
from solr_tpu.ops.bvh import build_bvh

pytestmark = pytest.mark.skipif(
    not native.native_available(), reason="no C++ toolchain"
)


def _random_aabbs(n, seed=0):
    rng = np.random.default_rng(seed)
    c = rng.uniform(-10, 10, (n, 3)).astype(np.float32)
    h = rng.uniform(0.01, 0.5, (n, 3)).astype(np.float32)
    return c - h, c + h


@pytest.mark.parametrize("n", [1, 3, 64, 65, 1000, 4097])
@pytest.mark.parametrize("leaf_size", [4, 8, 64])
def test_native_matches_numpy(n, leaf_size):
    amin, amax = _random_aabbs(n, seed=n)
    b_nat, o_nat = build_bvh(amin, amax, leaf_size, backend="native")
    b_np, o_np = build_bvh(amin, amax, leaf_size, backend="numpy")
    npt.assert_array_equal(o_nat, o_np)
    npt.assert_array_equal(np.asarray(b_nat.skip), np.asarray(b_np.skip))
    npt.assert_array_equal(
        np.asarray(b_nat.first_prim), np.asarray(b_np.first_prim)
    )
    npt.assert_array_equal(
        np.asarray(b_nat.prim_count), np.asarray(b_np.prim_count)
    )
    npt.assert_array_equal(np.asarray(b_nat.depth), np.asarray(b_np.depth))
    npt.assert_allclose(
        np.asarray(b_nat.aabb_min), np.asarray(b_np.aabb_min), atol=1e-6
    )
    npt.assert_allclose(
        np.asarray(b_nat.aabb_max), np.asarray(b_np.aabb_max), atol=1e-6
    )
    npt.assert_array_equal(
        np.asarray(b_nat.leaf_first), np.asarray(b_np.leaf_first)
    )
    npt.assert_array_equal(
        np.asarray(b_nat.leaf_count), np.asarray(b_np.leaf_count)
    )


def test_native_tree_invariants():
    amin, amax = _random_aabbs(2000, seed=7)
    bvh, order = build_bvh(amin, amax, leaf_size=8, backend="native")
    first = np.asarray(bvh.first_prim)
    count = np.asarray(bvh.prim_count)
    skip = np.asarray(bvh.skip)
    k = first.shape[0]
    # Every primitive appears in exactly one leaf range.
    covered = np.zeros(2000, np.int32)
    for f, c in zip(first, count):
        if f >= 0:
            covered[f : f + c] += 1
    assert (covered == 1).all()
    # Skip pointers form a valid monotone forward walk.
    assert (skip > np.arange(k)).all() and (skip <= k).all()
    # Node AABBs contain their primitives (after reorder).
    smin, smax = amin[order], amax[order]
    nmin = np.asarray(bvh.aabb_min)
    nmax = np.asarray(bvh.aabb_max)
    for i in range(k):
        if first[i] >= 0:
            s = slice(first[i], first[i] + count[i])
            assert (nmin[i] <= smin[s].min(axis=0) + 1e-4).all()
            assert (nmax[i] >= smax[s].max(axis=0) - 1e-4).all()


def test_native_triangle_aabbs():
    rng = np.random.default_rng(3)
    v0, v1, v2 = (rng.normal(size=(500, 3)).astype(np.float32) for _ in range(3))
    got = native.triangle_aabbs(v0, v1, v2)
    assert got is not None
    npt.assert_allclose(got[0], np.minimum(np.minimum(v0, v1), v2))
    npt.assert_allclose(got[1], np.maximum(np.maximum(v0, v1), v2))
