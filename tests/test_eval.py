"""Evaluation-layer tests: FID math, struct metrics, aggregation, BPD."""

import jax
import jax.numpy as jnp
import numpy as np

from superdiff_tpu.core import VPSchedule
from superdiff_tpu.eval import aggregate, bpd, fid, struct_metrics, tifa
from superdiff_tpu.eval.clip_metrics import aggregate_two_prompt_scores


def test_fid_identical_distributions_is_zero():
    rng = np.random.default_rng(0)
    a = rng.normal(size=(2000, 16))
    f = fid.fid_from_features(a, a.copy())
    assert abs(f) < 1e-6


def test_fid_mean_shift_equals_squared_distance():
    rng = np.random.default_rng(0)
    a = rng.normal(size=(20000, 8))
    b = a + 2.0  # same cov, shifted mean
    f = fid.fid_from_features(a, b)
    np.testing.assert_allclose(f, 8 * 4.0, rtol=0.02)


def test_inception_score_bounds():
    rng = np.random.default_rng(0)
    # confident, diverse predictions -> high IS; uniform -> 1.0
    n, c = 1000, 10
    confident = np.full((n, c), -20.0)
    confident[np.arange(n), rng.integers(0, c, n)] = 20.0
    is_hi, _ = fid.inception_score(confident)
    uniform = np.zeros((n, c))
    is_lo, _ = fid.inception_score(uniform)
    assert is_hi > 8.0 and abs(is_lo - 1.0) < 1e-3


def test_kabsch_rmsd_and_tm():
    rng = np.random.default_rng(1)
    P = rng.normal(size=(50, 3)) * 5
    # random rigid transform of P
    from superdiff_tpu.models.protein import rigid as rg

    R = np.asarray(rg.rotvec_to_rotmat(jnp.asarray([0.3, -0.5, 0.9])))
    Q = P @ R.T + np.array([1.0, 2.0, 3.0])
    assert struct_metrics.aligned_rmsd(P, Q) < 1e-4
    assert struct_metrics.tm_score(P, Q) > 0.9999
    # perturbed copy: rmsd grows, tm drops
    Q2 = Q + rng.normal(size=Q.shape) * 2.0
    assert struct_metrics.aligned_rmsd(P, Q2) > 1.0
    assert struct_metrics.tm_score(P, Q2) < 0.9


def test_clash_counting():
    ca = np.array([[0, 0, 0], [3.8, 0, 0], [7.6, 0, 0], [0.5, 0, 0.5]])
    # residue 3 clashes with residue 0 (non-bonded, d ~ 0.7 A)
    assert struct_metrics.ca_ca_clashes(ca) == 1


def test_two_prompt_aggregation():
    out = aggregate_two_prompt_scores([(1.0, 3.0), (2.0, 2.0)])
    assert out["min_mean"] == 1.5 and out["avg_mean"] == 2.0


def test_tifa_aggregation_joint_baselines():
    scores = {
        "sd_ab": [{"tifa_min": 0.5, "tifa_max": 0.8}, {"tifa_min": 0.7, "tifa_max": 0.9}],
        "sd_ba": [{"tifa_min": 0.6, "tifa_max": 0.7}, {"tifa_min": 0.4, "tifa_max": 0.6}],
        "and": [{"tifa_min": 0.8, "tifa_max": 0.9}],
    }
    out = tifa.aggregate_tifa_runs(scores)
    np.testing.assert_allclose(out["joint"]["min_mean"], (0.6 + 0.7) / 2)
    np.testing.assert_allclose(out["coin_flip"]["min_mean"], (0.55 + 0.55) / 2)
    np.testing.assert_allclose(out["and"]["min_mean"], 0.8)


def test_bpd_gaussian_data_matches_entropy():
    """BPD of N(0, s^2) data under the exact Gaussian score oracle should
    approach the analytic differential entropy converted to bits/dim + 7."""
    sched = VPSchedule()
    s = 0.5
    d = 4

    def score_apply(t, x):
        a, sig = sched.alpha(t), sched.sigma(t)
        var = a**2 * s**2 + sig**2
        return -sig * x / var

    est = bpd.make_bpd_estimator(score_apply, sched, n_steps=200, t_0=1e-4)
    x0 = s * jax.random.normal(jax.random.PRNGKey(0), (256, d))
    val, nfe = jax.jit(est)(jax.random.PRNGKey(1), x0)
    # E[-log p]/d in bits for N(0, s^2): 0.5*log2(2*pi*e*s^2)
    expect = 0.5 * np.log2(2 * np.pi * np.e * s**2) + 7.0
    np.testing.assert_allclose(float(val), expect, rtol=0.02)


def test_aggregate_and_or_scores(tmp_path):
    import pandas as pd

    d = tmp_path / "metrics_and"
    d.mkdir()
    pd.DataFrame(
        {
            "clip_raw_score_1": [1.0, 2.0],
            "clip_raw_score_2": [3.0, 1.0],
            "min_clip": [1.0, 1.0],
        }
    ).to_csv(d / "metrics_and_pair.csv", index=False)
    df = aggregate.load_metric_csvs(str(tmp_path), "and")
    assert len(df) == 2
    a = aggregate.and_scores(df)
    np.testing.assert_allclose(a["min_mean"], 1.0)
    o = aggregate.or_scores(df)
    np.testing.assert_allclose(o["max_mean"], 2.5)


def test_fld_prefers_matching_distribution():
    """FLD is lower for generated features matching train/test than for a
    shifted distribution, and higher for memorized (train-copy) samples
    evaluated against held-out test data."""
    from superdiff_tpu.eval import fld as fld_mod

    rng = np.random.default_rng(0)
    d = 8
    train = rng.normal(size=(400, d))
    test = rng.normal(size=(400, d))
    good_gen = rng.normal(size=(200, d))
    shifted_gen = rng.normal(size=(200, d)) + 3.0
    f_good = fld_mod.fld(good_gen, train, test, n_steps=60)
    f_bad = fld_mod.fld(shifted_gen, train, test, n_steps=60)
    assert f_good < f_bad, (f_good, f_bad)
    # memorization: exact train copies overfit train -> worse on test
    memorized = train[:200].copy()
    f_mem = fld_mod.fld(memorized, train, test, n_steps=60)
    assert f_good <= f_mem + 0.05, (f_good, f_mem)


def test_fld_single_center_matches_closed_form():
    """Closed-form validation of the FLD estimator (VERDICT round-1 item 9).

    With every generated feature at the same point c, the fitted MoG
    degenerates to a single Gaussian N(c, s^2 I).  The train-likelihood-
    maximizing bandwidth has the closed form s*^2 = E_train||x-c||^2 / d,
    and the dimension-normalized test NLL is

        FLD = 0.5*log(2*pi*s*^2) + E_test||x-c||^2 / (2*d*s*^2).

    This pins the fit procedure (gradient ascent on train LL) and the NLL
    normalization against exact values; agreement here means our numbers
    are comparable across our own runs the way the fld package's are
    (eval_fld.ipynb cells 0-2 protocol).
    """
    from superdiff_tpu.eval import fld as fld_mod

    rng = np.random.default_rng(3)
    d, n_train, n_test = 6, 500, 500
    c = rng.normal(size=(d,))
    train = rng.normal(size=(n_train, d)) * 1.3
    test = rng.normal(size=(n_test, d)) * 1.3
    gen = np.broadcast_to(c, (32, d)).copy()  # all centers identical

    sigma2_star = np.mean(np.sum((train - c) ** 2, axis=1)) / d
    expected = 0.5 * np.log(2 * np.pi * sigma2_star) + np.mean(
        np.sum((test - c) ** 2, axis=1)
    ) / (2 * d * sigma2_star)

    got = fld_mod.fld(gen, train, test, n_steps=400)
    np.testing.assert_allclose(got, expected, rtol=2e-3)

    # fitted bandwidths themselves converge to the closed-form optimum
    log_var = fld_mod.fit_mog_bandwidths(gen, train, n_steps=400)
    np.testing.assert_allclose(np.exp(log_var), sigma2_star, rtol=5e-3)


def test_fld_robust_on_large_norm_features():
    """Regression for the round-2 quality-run degeneracy: on high-dim
    large-norm features (random-Inception scale, ||x|| ~ 450) the MoG fit
    must stay finite — including with exact-train-copy centers, which the
    bandwidth clamp keeps from collapsing to NaN — and preserve the quality
    ordering good < noise, memorized >> ideal."""
    from superdiff_tpu.eval import fld as fld_mod

    rng = np.random.default_rng(0)
    d = 512
    w = rng.normal(size=(d, d)).astype(np.float32) * 0.4
    train = (rng.normal(size=(600, d)).astype(np.float32) @ w + 5.0)
    test = (rng.normal(size=(600, d)).astype(np.float32) @ w + 5.0)
    good = (rng.normal(size=(128, d)).astype(np.float32) @ w + 5.0)
    noise = rng.normal(size=(128, d)).astype(np.float32) * 300.0
    f_good = fld_mod.fld(good, train, test, n_steps=120)
    f_noise = fld_mod.fld(noise, train, test, n_steps=120)
    f_mem = fld_mod.fld(train[:128].copy(), train, test, n_steps=120)
    assert np.isfinite([f_good, f_noise, f_mem]).all(), (f_good, f_noise, f_mem)
    assert f_good < f_noise
    assert f_mem > f_good


def test_fld_rotation_invariance():
    """FLD depends only on pairwise geometry: applying one orthogonal map to
    gen/train/test leaves the value unchanged (sanity on the estimator)."""
    from superdiff_tpu.eval import fld as fld_mod

    rng = np.random.default_rng(5)
    d = 5
    train = rng.normal(size=(200, d))
    test = rng.normal(size=(200, d))
    gen = rng.normal(size=(100, d))
    q, _ = np.linalg.qr(rng.normal(size=(d, d)))
    f0 = fld_mod.fld(gen, train, test, n_steps=80)
    f1 = fld_mod.fld(gen @ q, train @ q, test @ q, n_steps=80)
    np.testing.assert_allclose(f0, f1, rtol=1e-4, atol=1e-5)
