"""Structure-embedding map (eval/embed_viz.py, the protein_umap analog):
the on-device all-vs-all TM affinity must match the numpy metric, and the
2D layout must separate synthetic structural families.
"""

import os

import numpy as np
import pytest

from superdiff_tpu.eval import embed_viz
from superdiff_tpu.eval.struct_metrics import tm_score_kabsch


def _helix(n, seed, noise=0.15):
    rng = np.random.default_rng(seed)
    t = np.arange(n)
    ang = np.deg2rad(100.0) * t
    xyz = np.stack([2.3 * np.cos(ang), 2.3 * np.sin(ang), 1.5 * t], -1)
    return (xyz + noise * rng.standard_normal((n, 3))).astype(np.float32)


def _strand(n, seed, noise=0.15):
    rng = np.random.default_rng(seed)
    t = np.arange(n)
    xyz = np.stack([3.3 * t, 1.0 * (t % 2), 0.2 * t], -1)
    return (xyz + noise * rng.standard_normal((n, 3))).astype(np.float32)


@pytest.fixture(scope="module")
def families():
    helices = [_helix(60, s) for s in range(6)]
    strands = [_strand(60, s + 50) for s in range(6)]
    return helices, strands


def test_tm_affinity_matches_numpy_metric(families):
    helices, strands = families
    coords = helices[:2] + strands[:2]
    A = embed_viz.tm_affinity(coords)
    assert A.shape == (4, 4)
    np.testing.assert_allclose(np.diag(A), 1.0, atol=1e-3)
    np.testing.assert_allclose(A, A.T, atol=1e-4)
    for i in range(4):
        for j in range(i + 1, 4):
            ref = tm_score_kabsch(coords[i], coords[j])
            assert abs(A[i, j] - ref) < 2e-3, (i, j, A[i, j], ref)


def test_tm_affinity_unequal_lengths_truncates(families):
    helices, _ = families
    short = helices[0][:40]
    A = embed_viz.tm_affinity([helices[1], short])
    ref = tm_score_kabsch(helices[1][:40], short)
    assert abs(A[0, 1] - ref) < 2e-3


def test_embedding_separates_families(families):
    helices, strands = families
    A = embed_viz.tm_affinity(helices + strands)
    # helix-vs-helix similarity must dominate helix-vs-strand
    hh = A[:6, :6][np.triu_indices(6, 1)].mean()
    hs = A[:6, 6:].mean()
    assert hh > hs + 0.2, (hh, hs)
    for method in ("numpy", "spectral"):
        xy = embed_viz.embed_2d(A, method=method)
        assert xy.shape == (12, 2)
        c_h, c_s = xy[:6].mean(0), xy[6:].mean(0)
        spread = max(
            np.linalg.norm(xy[:6] - c_h, axis=1).mean(),
            np.linalg.norm(xy[6:] - c_s, axis=1).mean(),
        )
        assert np.linalg.norm(c_h - c_s) > spread, (method, c_h, c_s, spread)


def test_structure_map_writes_figure(tmp_path, families):
    helices, strands = families
    out = os.path.join(tmp_path, "umap.png")
    res = embed_viz.structure_map(
        {"FrameDiff": helices[:3], "Proteus": strands[:3]}, out_png=out,
        method="numpy",
    )
    assert os.path.exists(out) and os.path.getsize(out) > 1000
    assert res["xy"].shape == (6, 2)
    assert res["labels"] == ["FrameDiff"] * 3 + ["Proteus"] * 3
