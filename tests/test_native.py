"""Native C++ neighbor library vs scipy reference."""

import numpy as np
import pytest
from scipy.spatial import cKDTree

native = pytest.importorskip("dbw_tpu.native")


@pytest.fixture(scope="module")
def lib():
    lib = native.get_lib()
    if lib is None:
        pytest.skip("native library build unavailable")
    return lib


class TestNativeKDTree:
    def test_matches_scipy(self, lib):
        rng = np.random.default_rng(0)
        pts = rng.random((5000, 3)).astype(np.float32) * 10
        q = rng.random((2000, 3)).astype(np.float32) * 10
        tree = native.NativeKDTree(pts)
        d, i = tree.query(q)
        ref_d, ref_i = cKDTree(pts).query(q, k=1)
        np.testing.assert_allclose(d, ref_d, atol=1e-4)
        # indices may differ on exact ties; distances must agree
        np.testing.assert_allclose(
            np.linalg.norm(pts[i] - q, axis=1), ref_d, atol=1e-4
        )

    def test_greedy_downsample_matches_reference_loop(self, lib):
        rng = np.random.default_rng(1)
        pts = rng.random((3000, 3)).astype(np.float32)
        radius = 0.05
        mask = native.greedy_radius_downsample_native(pts, radius)
        # reference-semantics python loop
        tree = cKDTree(pts)
        nbrs = tree.query_ball_point(pts, r=radius)
        ref = np.ones(len(pts), bool)
        for curr, idxs in enumerate(nbrs):
            if ref[curr]:
                ref[idxs] = False
                ref[curr] = True
        np.testing.assert_array_equal(mask, ref)

    def test_downsample_spacing(self, lib):
        rng = np.random.default_rng(2)
        pts = rng.random((2000, 3)).astype(np.float32)
        mask = native.greedy_radius_downsample_native(pts, 0.1)
        kept = pts[mask]
        d = cKDTree(kept).query(kept, k=2)[0][:, 1]
        assert d.min() >= 0.1 - 1e-5
