"""Unit tests for the quality-table ordering semantics (eval/ordering.py).

The orderings are the checked signal of the on-chip quality protocol
(``scripts/quality_report.py`` — evals.ipynb cells 5/8/10/15 analog);
they must behave correctly in both the healthy regime and the two
stand-in degeneracies this image produces (ODE rows of weakly-trained
scores exceeding the noise FID; a random logits head collapsing IS to
~1.0 for every pool).
"""

from superdiff_tpu.eval.ordering import between_checks, build_orderings


def _row(fid, lo, hi, is_mean=None, is_std=None):
    r = {"fid_train": fid, "fid_train_ci95": [lo, hi]}
    if is_mean is not None:
        r["is_mean"] = is_mean
        r["is_std"] = is_std
    return r


def _base_rows():
    return {
        "model_A_sde": _row(50.0, 48, 52, 5.0, 0.2),
        "model_B_sde": _row(40.0, 38, 42, 5.2, 0.2),
        "joint_or_sde": _row(8.0, 7, 9, 6.0, 0.2),
        "joint_avg_sde": _row(30.0, 28, 32, 5.5, 0.2),
        "pool_mixed_baseline": _row(25.0, 23, 27),
        "model_A_ode": _row(60.0, 57, 63, 4.8, 0.2),
        "model_B_ode": _row(70.0, 67, 73, 4.6, 0.2),
        "joint_or_ode": _row(55.0, 52, 54, 5.0, 0.2),
        "sanity_train_subset": _row(1.0, 0.8, 1.2, 9.0, 0.3),
        "sanity_noise": _row(300.0, 295, 305, 1.5, 0.1),
        "untrained_model_sde": _row(900.0, 890, 910),
    }


def _by_claim(orderings):
    return {o["claim"]: o for o in orderings}


def test_healthy_regime_all_separated():
    o = _by_claim(build_orderings(_base_rows()))
    assert o["sanity_train_subset << every generated row"]["separated"]
    assert o["every SDE-sampled row << sanity_noise"]["separated"]
    assert o["every SDE-sampled row << untrained model"]["separated"]
    assert o["sde: joint < worst single (model_A_sde), CI-separated"]["separated"]
    assert o["ode: joint < worst single (model_B_ode), CI-separated"]["separated"]
    info = o["informational: ODE matrix vs noise FID"]
    assert info["note"] == "ODE rows below noise"
    # IS spread here is > 0.5: the checks must NOT carry the stand-in note
    assert "stand_in_note" not in o["is: every generated row > sanity_noise"]


def test_two_sided_placement():
    rows = _base_rows()
    checks = between_checks(rows, "joint_or_sde",
                            ["model_A_sde", "model_B_sde"], "sde")
    assert checks[0]["separated"]  # 9 < 38
    assert checks[1]["placement"] == "below both singles"
    rows["joint_or_sde"] = _row(45.0, 43, 47)
    checks = between_checks(rows, "joint_or_sde",
                            ["model_A_sde", "model_B_sde"], "sde")
    assert checks[0]["separated"]  # 47 < 48
    assert checks[1]["placement"] == "between the singles"


def test_tie_with_worst_single_not_separated():
    """VERDICT r4 #5: the old one-sided '<=' passed on a tie; the two-sided
    form must not."""
    rows = _base_rows()
    rows["joint_or_sde"] = _row(50.0, 48, 52)  # ties model_A_sde exactly
    checks = between_checks(rows, "joint_or_sde",
                            ["model_A_sde", "model_B_sde"], "sde")
    assert not checks[0]["separated"]


def test_ode_collapse_informational_not_bound():
    """ODE rows exceeding the noise FID (the r5 on-chip regime for the
    weakly-trained stand-in) must not fail the SDE noise bound, and must
    surface through the informational entry."""
    rows = _base_rows()
    rows["model_A_ode"] = _row(800.0, 790, 810, 1.0, 0.001)
    rows["model_B_ode"] = _row(840.0, 830, 850, 1.0, 0.001)
    rows["joint_or_ode"] = _row(805.0, 798, 809, 1.0, 0.001)
    o = _by_claim(build_orderings(rows))
    assert o["every SDE-sampled row << sanity_noise"]["separated"]
    info = o["informational: ODE matrix vs noise FID"]
    assert "probability flow" in info["note"]
    # the matrix-internal ODE signal still asserts
    assert o["ode: joint < worst single (model_B_ode), CI-separated"]["separated"]


def test_degenerate_is_annotated():
    rows = _base_rows()
    for n in rows:
        if "is_mean" in rows[n]:
            rows[n]["is_mean"] = 1.0 + 0.01 * hash(n) % 3 * 0.01
            rows[n]["is_std"] = 0.002
    o = _by_claim(build_orderings(rows))
    c = o["is: every generated row > sanity_noise"]
    assert "stand_in_note" in c and "random-init logits head" in c["stand_in_note"]


def test_missing_ode_rows_tolerated():
    rows = {k: v for k, v in _base_rows().items()
            if k not in ("model_A_ode", "model_B_ode", "joint_or_ode")}
    o = build_orderings(rows)
    claims = [c["claim"] for c in o]
    assert not any(c.startswith("ode:") for c in claims)
    assert any(c.startswith("sde:") for c in claims)
