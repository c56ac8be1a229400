"""Cross-run metric aggregation for the SD composition experiments.

Rebuild of ``applications/images/parse_img_metric_files.py``: combine
per-(prompt-pair, seed, method) metric CSVs into the paper's comparison
table. Composition rules carried over:

* ``joint``      — best of the two prompt orderings (sd_ab vs sd_ba), the
  strongest single-prompt baseline (``parse_img_metric_files.py:139-155``).
* ``coin_flip``  — expected score of randomly picking one ordering.
* AND metric     — batch mean of the per-image MIN over the two prompts
  (faithful to both concepts).
* OR metric      — per-image MAX over prompts, and the |A-B| balance gap.
"""

from __future__ import annotations

import glob
import os
from typing import Dict, Iterable, List

import numpy as np
import pandas as pd


def load_metric_csvs(root: str, method: str) -> pd.DataFrame:
    """Load ``metrics_{method}/metrics_{method}_{pair}.csv`` files written by
    the pipeline runner into one frame with a 'pair' column."""
    frames = []
    for path in sorted(glob.glob(os.path.join(root, f"metrics_{method}", "*.csv"))):
        df = pd.read_csv(path)
        df["pair"] = os.path.basename(path).rsplit(".", 1)[0]
        frames.append(df)
    if not frames:
        return pd.DataFrame()
    return pd.concat(frames, ignore_index=True)


def and_scores(df: pd.DataFrame, prefix: str = "clip") -> Dict[str, float]:
    """AND operator metric: mean over images of min(score_A, score_B)."""
    a = df[f"{prefix}_raw_score_1"].to_numpy()
    b = df[f"{prefix}_raw_score_2"].to_numpy()
    return {
        "min_mean": float(np.minimum(a, b).mean()),
        "avg_mean": float(((a + b) / 2).mean()),
    }


def or_scores(df: pd.DataFrame, prefix: str = "clip") -> Dict[str, float]:
    """OR operator metrics: per-image max and the balance gap |A - B|."""
    a = df[f"{prefix}_raw_score_1"].to_numpy()
    b = df[f"{prefix}_raw_score_2"].to_numpy()
    return {
        "max_mean": float(np.maximum(a, b).mean()),
        "gap_mean": float(np.abs(a - b).mean()),
    }


def joint_baseline(
    df_ab: pd.DataFrame, df_ba: pd.DataFrame, column: str = "min_clip"
) -> Dict[str, float]:
    """Best-of-orderings and coin-flip baselines over aligned rows."""
    ab = df_ab[column].to_numpy()
    ba = df_ba[column].to_numpy()
    n = min(len(ab), len(ba))
    ab, ba = ab[:n], ba[:n]
    return {
        "joint": float(np.maximum(ab, ba).mean()),
        "coin_flip": float(((ab + ba) / 2).mean()),
        "sd_ab": float(ab.mean()),
        "sd_ba": float(ba.mean()),
    }


def summarize_methods(
    root: str, methods: Iterable[str], prefix: str = "clip"
) -> pd.DataFrame:
    """One row per method with AND/OR aggregates; adds joint/coin_flip when
    both orderings are present."""
    rows: List[dict] = []
    cache = {m: load_metric_csvs(root, m) for m in methods}
    for m, df in cache.items():
        if df.empty:
            continue
        row = {"method": m, **and_scores(df, prefix), **or_scores(df, prefix)}
        rows.append(row)
    out = pd.DataFrame(rows)
    ab, ba = cache.get("sd_ab"), cache.get("sd_ba")
    if ab is not None and ba is not None and not ab.empty and not ba.empty:
        jb = joint_baseline(ab, ba, column=f"min_{prefix}")
        out.attrs["joint_baseline"] = jb
    return out
