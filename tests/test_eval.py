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


def test_fid_bootstrap_matches_plain_fid_and_separates():
    """fid_bootstrap: value identical to fid_from_features (eigvalsh trick
    vs sqrtm), CI covers the value, and distinct distributions give
    non-overlapping CIs while a re-draw of the same distribution overlaps."""
    rng = np.random.default_rng(0)
    ref = rng.normal(size=(4000, 24))
    same = rng.normal(size=(1000, 24))
    far = rng.normal(size=(1000, 24)) + 1.0
    b_same = fid.fid_bootstrap(ref, same, n_boot=16)
    b_far = fid.fid_bootstrap(ref, far, n_boot=16)
    np.testing.assert_allclose(
        b_same["value"], fid.fid_from_features(ref, same), rtol=1e-6, atol=1e-8
    )
    assert b_far["ci95"][0] > b_same["ci95"][1]  # separated: shift >> noise
    assert b_far["ci95"][0] < b_far["value"] < b_far["ci95"][1] * 1.5
    assert b_same["boot_std"] > 0


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


def test_tifa_choice_matching_and_scoring():
    """Native tifa_score_single: free-form answers map onto choices (exact,
    containment, similarity) and the score is per-question accuracy with
    the tifascore detail schema."""
    qas = [
        {"caption": "a cactus", "element": "cactus", "question": "is this a cactus?",
         "choices": ["yes", "no"], "answer": "yes", "element_type": "object"},
        {"caption": "a cactus", "element": "cactus",
         "question": "what plant is in the picture?",
         "choices": ["cactus", "rose", "sunflower", "fern"], "answer": "cactus",
         "element_type": "object"},
    ]
    answers = {
        "is this a cactus?": "Yes, it is.",        # containment after normalize
        "what plant is in the picture?": "a cactis",  # typo -> similarity match
    }
    res = tifa.tifa_score_single(lambda img, q, ch: answers[q], qas, "img.png")
    assert res["tifa_score"] == 1.0
    d = res["question_details"]["what plant is in the picture?"]
    assert d["multiple_choice_vqa"] == "cactus" and d["scores"] == 1.0
    # A wrong free-form answer scores 0 on that question only.
    wrong = dict(answers, **{"what plant is in the picture?": "a rose"})
    res2 = tifa.tifa_score_single(lambda img, q, ch: wrong[q], qas, "img.png")
    assert res2["tifa_score"] == 0.5
    d2 = res2["question_details"]["what plant is in the picture?"]
    assert d2["multiple_choice_vqa"] == "rose" and d2["scores"] == 0.0


def test_tifa_experiment_end_to_end_with_mocks(tmp_path):
    """The full tifa_eval.py chain — generation, UnifiedQA-style filter,
    question persistence, per-method image loop, min/max aggregation —
    executed end-to-end with mock callables (zero external weights)."""
    taskinfo = [{"dir_": "cactus_dandelion", "text_AB": "a cactus and a dandelion",
                 "text_BA": "a dandelion and a cactus"}]

    def question_gen(caption):
        first = caption.split()[1]
        return [
            {"caption": caption, "element": first,
             "question": f"is there a {first}?", "choices": ["yes", "no"],
             "answer": "yes", "element_type": "object"},
            # Inconsistent generation: the filter must drop it (the caption
            # never supports answering "no").
            {"caption": caption, "element": first,
             "question": f"is the {first} absent?", "choices": ["yes", "no"],
             "answer": "yes", "element_type": "object"},
        ]

    def qa_fn(context, question, choices):
        subject = question.split()[-1].rstrip("?")
        if "absent" in question:
            return "no"
        return "yes" if subject in context else "no"

    # Image faithfulness by method: "or" satisfies both phrasings,
    # sd_a only the AB one.
    def vqa_fn(image, question, choices):
        if "/or/" in image:
            return "yes"
        return "yes" if "cactus" in question else "no"

    calls = {"gen": 0}

    def counting_gen(caption):
        calls["gen"] += 1
        return question_gen(caption)

    kwargs = dict(
        taskinfo=taskinfo, qa_fn=qa_fn, vqa_fn=vqa_fn,
        image_path_fn=lambda m, d, i: f"/results/{m}/{d}/{i}.png",
        n_images=3, methods=("or", "sd_a"), q_dir=str(tmp_path),
    )
    out = tifa.run_tifa_experiment(question_gen=counting_gen, **kwargs)
    task = out["cactus_dandelion"]
    # Both phrasings keep exactly the consistent question after filtering.
    qfile = tmp_path / "cactus_dandelion.json"
    assert qfile.exists()
    import json as _json
    saved = _json.loads(qfile.read_text())
    assert len(saved["filtered_questions_AB"]) == 1
    assert len(saved["filtered_questions_BA"]) == 1
    # "or" is faithful to both phrasings; sd_a fails the BA phrasing's min.
    assert task["summary"]["or"]["mean"] == 1.0
    assert task["scores"]["sd_a"]["min"] == [0.0, 0.0, 0.0]
    assert task["scores"]["sd_a"]["max"] == [1.0, 1.0, 1.0]
    assert task["summary"]["sd_a"]["n"] == 3
    assert calls["gen"] == 2  # AB + BA, once each
    # Rerun: questions reload from q_dir, generation is never called again.
    out2 = tifa.run_tifa_experiment(question_gen=counting_gen, **kwargs)
    assert calls["gen"] == 2
    assert out2["cactus_dandelion"]["summary"] == task["summary"]


def test_tifa_filter_drops_unanswerable_questions():
    qas = [{"caption": "a red cube", "question": "what color is the cube?",
            "choices": ["red", "blue"], "answer": "red"},
           {"caption": "a red cube", "question": "what color is the sphere?",
            "choices": ["red", "blue"], "answer": "blue"}]

    def qa_fn(context, question, choices):
        # The sphere isn't in the caption: the QA model guesses the wrong
        # choice, so the consistency filter must drop that question.
        return "red"

    kept = tifa.filter_question_and_answers(qa_fn, qas)
    assert [q["question"] for q in kept] == ["what color is the cube?"]


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


def _hinge_pair(n=100, n_a=70, angle=1.0, seed=0):
    """Two-domain backbone pair: identical chain, second domain rotated
    about the hinge residue — the case where the RMSD-optimal (Kabsch)
    superposition measurably UNDERSTATES the TM-score (it compromises
    between domains instead of locking onto the larger one)."""
    from scipy.spatial.transform import Rotation

    rng = np.random.default_rng(seed)
    steps = rng.normal(size=(n, 3))
    steps /= np.linalg.norm(steps, axis=-1, keepdims=True)
    for i in range(1, n):  # correlate directions into a chain-like path
        v = 0.7 * steps[i - 1] + 0.3 * steps[i]
        steps[i] = v / np.linalg.norm(v)
    P = np.cumsum(3.8 * steps, 0)
    Rb = Rotation.from_rotvec(angle * np.array([0.0, 0.0, 1.0])).as_matrix()
    Q = P.copy()
    Q[n_a:] = (P[n_a:] - P[n_a]) @ Rb.T + P[n_a]
    return P, Q


def _tm_brute_force(P, Q):
    """Reference TM-optimal superposition: Nelder-Mead over (rotvec, t)
    from domain-fit + random starts. Stands in for tmtools' TM-align
    (absent in this image) at fixed identity correspondence."""
    from scipy.optimize import minimize
    from scipy.spatial.transform import Rotation

    d0 = struct_metrics._d0(len(P))

    def neg(x):
        R = Rotation.from_rotvec(x[:3]).as_matrix()
        d2 = (((P @ R.T + x[3:]) - Q) ** 2).sum(-1)
        return -np.mean(1.0 / (1.0 + d2 / d0**2))

    starts = []
    for sl in (slice(None), slice(0, 70), slice(70, None), slice(25, 75)):
        R, t = struct_metrics.kabsch(P[sl], Q[sl])
        starts.append(np.concatenate([Rotation.from_matrix(R).as_rotvec(), t]))
    rng = np.random.default_rng(0)
    for _ in range(10):
        starts.append(np.concatenate([rng.normal(size=3), rng.normal(size=3) * 5]))
    best = 0.0
    for s in starts:
        r = minimize(neg, s, method="Nelder-Mead",
                     options={"maxiter": 4000, "xatol": 1e-6, "fatol": 1e-10})
        best = max(best, -r.fun)
    return best


def test_tm_score_beats_kabsch_on_hinges():
    """On hinge-bent pairs the iterative TM-score must exceed the Kabsch
    lower bound by a real margin (VERDICT r3: near scTM~0.5 the Kabsch
    bound biased the designability headline downward)."""
    gaps = []
    for seed, angle, n_a in [(0, 1.0, 70), (1, 1.6, 60), (2, 0.8, 75)]:
        P, Q = _hinge_pair(seed=seed, angle=angle, n_a=n_a)
        k = struct_metrics.tm_score_kabsch(P, Q)
        o = struct_metrics.tm_score(P, Q)
        assert o >= k - 1e-12  # never worse than the bound
        gaps.append(o - k)
    assert max(gaps) > 0.2  # the seed=1 pair crosses the 0.5 threshold
    assert min(gaps) > 0.01


def test_tm_score_matches_brute_force_optimum():
    """tm_score within 0.01 of the scipy brute-force TM-optimal
    superposition on constructed hinge pairs (the tmtools stand-in;
    measured gaps are ~2e-4)."""
    for seed, angle, n_a in [(0, 1.0, 70), (1, 1.6, 60)]:
        P, Q = _hinge_pair(seed=seed, angle=angle, n_a=n_a)
        o = struct_metrics.tm_score(P, Q)
        b = _tm_brute_force(P, Q)
        assert abs(o - b) < 0.01, (o, b)


def test_tm_score_kabsch_is_lower_bound_on_random_pairs():
    rng = np.random.default_rng(3)
    for _ in range(5):
        P = np.cumsum(rng.normal(size=(60, 3)), 0) * 2
        Q = P + rng.normal(size=P.shape) * rng.uniform(0.5, 4.0)
        assert (struct_metrics.tm_score(P, Q)
                >= struct_metrics.tm_score_kabsch(P, Q) - 1e-12)


def test_tm_score_identity_rigid_transform():
    from scipy.spatial.transform import Rotation

    rng = np.random.default_rng(4)
    P = np.cumsum(rng.normal(size=(40, 3)), 0) * 2
    R = Rotation.from_rotvec([0.4, -1.1, 0.2]).as_matrix()
    Q = P @ R.T + np.array([5.0, -2.0, 1.0])
    assert struct_metrics.tm_score(P, Q) > 0.9999


def test_bpd_dopri5_matches_analytic_gaussian():
    """The adaptive Dopri5 path (the reference's diffrax integrator,
    ``cifar/eval_utils.py:30-37``) reproduces the analytic Gaussian BPD
    and reports a plausible adaptive NFE."""
    sched = VPSchedule()
    s, d = 0.5, 4

    def score_apply(t, x):
        a, sig = sched.alpha(t), sched.sigma(t)
        return -sig * x / (a**2 * s**2 + sig**2)

    est = bpd.make_bpd_estimator(score_apply, sched, method="dopri5", t_0=1e-4)
    x0 = s * jax.random.normal(jax.random.PRNGKey(0), (256, d))
    val, nfe = jax.jit(est)(jax.random.PRNGKey(1), x0)
    expect = 0.5 * np.log2(2 * np.pi * np.e * s**2) + 7.0
    np.testing.assert_allclose(float(val), expect, rtol=0.02)
    assert 30 < int(nfe) < 4096 * 6


def _train_toy_score_net(n_iters=400, dim=2):
    from superdiff_tpu.core import make_dsm_loss
    from superdiff_tpu.models import MLPScoreNet
    from superdiff_tpu.train import (
        init_train_state,
        make_optimizer,
        make_train_step,
    )

    sched = VPSchedule()
    key = jax.random.PRNGKey(7)
    model = MLPScoreNet(hidden=(64, 64), out_dim=dim)
    params = model.init(key, jnp.zeros((1, 1)), jnp.zeros((1, dim)))["params"]

    def apply_fn(p, t, x, y=None, rng=None):
        return model.apply({"params": p}, t, x)

    loss_fn = make_dsm_loss(apply_fn, sched, t_0=1e-3)
    opt = make_optimizer(lr=2e-3, warmup=50)
    state = init_train_state(key, params, opt, ema_rate=0.99)
    step = make_train_step(opt, loss_fn, donate=False)

    @jax.jit
    def data(k):
        # bimodal: the score net is genuinely non-Gaussian
        k1, k2 = jax.random.split(k)
        sign = jnp.where(jax.random.bernoulli(k1, 0.5, (256, 1)), 1.0, -1.0)
        return sign * 1.5 + 0.3 * jax.random.normal(k2, (256, dim))

    for i in range(n_iters):
        state, _ = step(state, {"image": data(jax.random.fold_in(key, i))})

    def score_apply(t, x):
        return model.apply({"params": state.params}, t, x)

    return score_apply, data, sched


def test_bpd_rk4_step_count_adequacy():
    """VERDICT r3 #7: on a *trained* toy score net, the fixed-grid RK4 BPD
    at the pinned default (n_steps=100) must agree with the adaptive
    Dopri5-at-1e-5 reference to well under the smallest gap in
    BASELINE.md's BPD table (0.08 bits/dim between model B 3.52 and joint
    3.44) — and the RK4 values must converge monotonically toward the
    adaptive reference as the grid refines (full sweep:
    ``scripts/bpd_sweep.py`` -> BENCH_DETAIL.json)."""
    score_apply, data, sched = _train_toy_score_net()
    x0 = np.asarray(data(jax.random.PRNGKey(99)))
    key = jax.random.PRNGKey(5)

    ref_est = bpd.make_bpd_estimator(
        score_apply, sched, method="dopri5", rtol=1e-5, atol=1e-5, t_0=1e-4
    )
    ref, _ = jax.jit(ref_est)(key, x0)
    ref = float(ref)

    vals = {}
    for n in (12, 25, 100):
        est = bpd.make_bpd_estimator(score_apply, sched, n_steps=n, t_0=1e-4)
        v, _ = jax.jit(est)(key, x0)  # same key: identical Hutchinson probe
        vals[n] = float(v)

    assert abs(vals[100] - ref) < 1e-3, (vals, ref)
    assert abs(vals[25] - ref) <= abs(vals[12] - ref) + 1e-6, (vals, ref)


def _tiny_clip_processor(tmp_path):
    """CLIPProcessor over synthesized vocab/merges — no downloads."""
    import json

    from transformers import CLIPImageProcessor, CLIPProcessor, CLIPTokenizer

    letters = "abcdefghijklmnopqrstuvwxyz"
    tokens = ["<|startoftext|>", "<|endoftext|>"]
    tokens += list(letters) + [c + "</w>" for c in letters]
    (tmp_path / "vocab.json").write_text(
        json.dumps({t: i for i, t in enumerate(tokens)})
    )
    (tmp_path / "merges.txt").write_text("#version: 0.2\n")
    tok = CLIPTokenizer(str(tmp_path / "vocab.json"), str(tmp_path / "merges.txt"))
    imp = CLIPImageProcessor(
        size={"shortest_edge": 32}, crop_size={"height": 32, "width": 32}
    )
    return CLIPProcessor(image_processor=imp, tokenizer=tok)


def test_clip_scorer_mock_end_to_end(tmp_path):
    """The full CLIP-score chain (clip_eval.py:108-139) executed with a tiny
    random transformers CLIPModel + synthesized tokenizer: uint8 images in,
    min/avg aggregation out. Real-weight absolutes stay gated; this pins the
    protocol itself."""
    import torch
    from transformers import CLIPConfig

    from superdiff_tpu.eval.clip_metrics import make_clip_scorer

    torch.manual_seed(0)
    cfg = CLIPConfig(
        text_config={
            "vocab_size": 64, "hidden_size": 16, "intermediate_size": 32,
            "num_hidden_layers": 2, "num_attention_heads": 2,
            "max_position_embeddings": 77,
        },
        vision_config={
            "hidden_size": 16, "intermediate_size": 32, "num_hidden_layers": 2,
            "num_attention_heads": 2, "image_size": 32, "patch_size": 16,
        },
        projection_dim=8,
    )
    from transformers import CLIPModel

    model = CLIPModel(cfg).eval()
    scorer = make_clip_scorer(model, _tiny_clip_processor(tmp_path))
    imgs = np.random.default_rng(0).integers(0, 256, (3, 24, 24, 3), np.uint8)
    out = scorer(imgs, "a cat", "a dog")
    assert len(out["raw"]) == 3 and len(out["min"]) == 3
    assert np.isfinite(out["min_mean"]) and np.isfinite(out["avg_mean"])
    assert out["min_mean"] <= out["avg_mean"] + 1e-9
    # deterministic model => scoring the same images again agrees
    again = scorer(imgs, "a cat", "a dog")
    assert out["raw"] == again["raw"]


def test_image_reward_scorer_via_injection():
    """make_image_reward_scorer over a stub reward model: PIL conversion,
    per-prompt loop, min/avg aggregation (clip_eval.py:144-158)."""
    from superdiff_tpu.eval.clip_metrics import make_image_reward_scorer

    class Stub:
        def score(self, prompt, pil):
            return float(len(prompt)) + float(np.asarray(pil).mean()) / 255.0

    imgs = np.zeros((2, 8, 8, 3), np.uint8)
    imgs[1] = 255
    out = make_image_reward_scorer(Stub())(imgs, "aa", "bbbb")
    assert out["raw"][0] == (2.0, 4.0)
    assert out["raw"][1] == (3.0, 5.0)
    assert out["min_mean"] == 2.5 and out["avg_mean"] == 3.5
