"""TIFA faithfulness evaluation: VQA-based scoring of composed images.

Rebuild of ``applications/images/tifa_eval.py`` + the TIFA rows of
``parse_img_metric_files.py:15-136``. The full pipeline needs three external
models (GPT question generation, UnifiedQA filtering, mPLUG VQA) via the
``tifascore`` package — gated here (absent, no egress). What is always
available:

* ``tifa_for_pair`` — the per-image protocol given a question-answering
  callable: generate/accept questions for BOTH prompt phrasings, score each,
  aggregate min/max (the AND operator is judged by the min over phrasings).
* ``aggregate_tifa_runs`` — the cross-seed experiment table: per method,
  mean-over-pairs of per-seed best scores, plus joint/coin-flip baselines.
"""

from __future__ import annotations

from typing import Callable, Dict, List, Optional

import numpy as np


def get_tifa_runner() -> Optional[Callable]:
    """Returns run(image, questions) -> accuracy using tifascore, or None."""
    try:
        from tifascore import UnifiedQAModel, VQAModel, tifa_score_single  # noqa
    except Exception:
        return None
    unifiedqa = UnifiedQAModel("allenai/unifiedqa-v2-t5-large-1363200")
    vqa = VQAModel("mplug-large")

    def run(image_path: str, question_answer_pairs: list) -> float:
        result = tifa_score_single(vqa, question_answer_pairs, image_path)
        return float(result["tifa_score"])

    return run


def tifa_for_pair(
    score_fn: Callable[[str, str], float],
    image_path: str,
    prompt_ab: str,
    prompt_ba: str,
) -> Dict[str, float]:
    """Score one image against both phrasings; min = faithful-to-both (AND),
    max = faithful-to-either (OR) — ``tifa_eval.py:70-106`` aggregation."""
    s_ab = score_fn(image_path, prompt_ab)
    s_ba = score_fn(image_path, prompt_ba)
    return {
        "tifa_ab": s_ab,
        "tifa_ba": s_ba,
        "tifa_min": min(s_ab, s_ba),
        "tifa_max": max(s_ab, s_ba),
    }


def aggregate_tifa_runs(
    per_seed_scores: Dict[str, List[Dict[str, float]]],
) -> Dict[str, Dict[str, float]]:
    """Experiment-level table from {method: [per-seed score dicts]}.

    Per method: mean of per-seed min/max; adds ``joint`` (best ordering per
    seed between sd_ab and sd_ba) and ``coin_flip`` when both are present
    (``parse_img_metric_files.py:139-155`` semantics).
    """
    out: Dict[str, Dict[str, float]] = {}
    for method, rows in per_seed_scores.items():
        if not rows:
            continue
        out[method] = {
            "min_mean": float(np.mean([r["tifa_min"] for r in rows])),
            "max_mean": float(np.mean([r["tifa_max"] for r in rows])),
        }
    ab, ba = per_seed_scores.get("sd_ab"), per_seed_scores.get("sd_ba")
    if ab and ba:
        n = min(len(ab), len(ba))
        best = [max(ab[i]["tifa_min"], ba[i]["tifa_min"]) for i in range(n)]
        coin = [(ab[i]["tifa_min"] + ba[i]["tifa_min"]) / 2 for i in range(n)]
        out["joint"] = {"min_mean": float(np.mean(best))}
        out["coin_flip"] = {"min_mean": float(np.mean(coin))}
    return out
