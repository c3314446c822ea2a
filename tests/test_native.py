"""Tests for the native (C++) proximity-edge selector: build, run, and
equivalence with the pure-Python policy (the reference's semantics)."""

import numpy as np
import pytest

from droid_slam_tpu import native


def python_reference(d, t0, t1, t, exist, rad, nms, thresh, max_factors,
                     stereo):
    """Direct port of the selection policy (factor_graph.py:305-369) used
    as the oracle for the C++ implementation."""
    d = d.copy()
    ii_g, jj_g = np.meshgrid(np.arange(t0, t), np.arange(t1, t),
                             indexing="ij")
    d[ii_g - rad < jj_g] = np.inf
    d[d > 100] = np.inf

    def suppress(i, j):
        r = max(min(abs(int(i) - int(j)) - 2, nms), 0)
        for di in range(-nms, nms + 1):
            for dj in range(-nms, nms + 1):
                if abs(di) + abs(dj) <= r:
                    i1, j1 = int(i) + di, int(j) + dj
                    if t0 <= i1 < t and t1 <= j1 < t:
                        d[i1 - t0, j1 - t1] = np.inf

    for (i, j) in exist:
        suppress(i, j)

    es = []
    for i in range(t0, t):
        if stereo:
            es.append((i, i))
            if t1 <= i:
                d[i - t0, i - t1] = np.inf
        for j in range(max(i - rad - 1, 0), i):
            es.append((i, j))
            es.append((j, i))
            if t1 <= j:
                d[i - t0, j - t1] = np.inf

    n_cols = d.shape[1]
    for k in np.argsort(d, axis=None, kind="stable"):
        di, dj = int(k) // n_cols, int(k) % n_cols
        if d[di, dj] > thresh:
            continue
        if len(es) > max_factors:
            break
        i, j = di + t0, dj + t1
        es.append((i, j))
        es.append((j, i))
        suppress(i, j)
    return es


@pytest.fixture(scope="module")
def lib():
    lib = native.get_lib()
    if lib is None:
        pytest.skip("native toolchain unavailable")
    return lib


class TestNativeProximity:
    @pytest.mark.parametrize("seed,stereo,nms", [(0, False, 2), (1, True, 1),
                                                 (2, False, 0), (3, True, 3)])
    def test_matches_python_reference(self, lib, seed, stereo, nms):
        rng = np.random.default_rng(seed)
        t, t0, t1 = 14, 2, 0
        d = (30 * rng.random((t - t0, t - t1))).astype(np.float32)
        exist = [(3, 5), (5, 3), (7, 2)]

        expect = python_reference(
            d, t0, t1, t, exist, rad=2, nms=nms, thresh=16.0,
            max_factors=40, stereo=stereo,
        )
        got = native.select_proximity_edges(
            d, t0, t1, t,
            np.asarray([e[0] for e in exist]),
            np.asarray([e[1] for e in exist]),
            rad=2, nms=nms, thresh=16.0, max_factors=40, stereo=stereo,
        )
        got_pairs = list(zip(got[0].tolist(), got[1].tolist()))
        assert got_pairs == expect

    def test_empty_candidates(self, lib):
        d = np.full((3, 3), np.inf, np.float32)
        got = native.select_proximity_edges(
            d, 0, 0, 3, np.zeros(0, np.int64), np.zeros(0, np.int64),
            rad=0, nms=1, thresh=10.0, max_factors=10, stereo=False,
        )
        # only the temporal edges (rad=0 -> j in [i-1, i))
        pairs = set(zip(got[0].tolist(), got[1].tolist()))
        assert (1, 0) in pairs and (0, 1) in pairs
