"""End-to-end self-consistency chain under mocks (no external weights).

Exercises the full subprocess-to-CSV pipeline of
``eval/self_consistency.py`` — the rebuild of the reference's
``evaluation/run_self_consistency.py:246-349`` — with a fake
``protein_mpnn_run.py`` CLI (whose first invocation fails, tripping the
bounded-retry path at ``run_self_consistency.py:274-288``) and a stub
ESMFold refolder, then feeds the resulting rows into the designability /
novelty aggregation (``eval/novelty.py`` — ``novel_proteins.ipynb``
cells 1-4). Zero external weights, runs in seconds.
"""

from __future__ import annotations

import csv
import os
import sys
import textwrap

import numpy as np
import pytest

from superdiff_tpu.eval import novelty
from superdiff_tpu.eval.self_consistency import (
    SelfConsistencyConfig,
    run_self_consistency,
)

AA = "ACDEFGHIKLMNPQRSTVWY"


def _helix_ca(n=24, seed=0):
    t = np.arange(n) * 100.0 * np.pi / 180.0
    ca = np.stack([2.3 * np.cos(t), 2.3 * np.sin(t), 1.5 * np.arange(n)], -1)
    return ca + np.random.default_rng(seed).normal(size=ca.shape) * 0.05


def _write_mock_mpnn(tmp_path, n_res, fail_first=True):
    """A fake ProteinMPNN CLI: first call exits 1 (garbage output — the
    failure mode the reference retries on), later calls write a FASTA whose
    first record is the input sequence followed by the designed ones."""
    marker = tmp_path / "mpnn_called"
    script = tmp_path / "protein_mpnn_run.py"
    script.write_text(textwrap.dedent(f"""\
        import argparse, os, sys, random
        p = argparse.ArgumentParser()
        p.add_argument("--pdb_path"); p.add_argument("--out_folder")
        p.add_argument("--num_seq_per_target", type=int)
        p.add_argument("--sampling_temp"); p.add_argument("--seed", type=int)
        p.add_argument("--batch_size", type=int)
        a = p.parse_args()
        marker = {str(marker)!r}
        if {fail_first!r} and not os.path.exists(marker):
            open(marker, "w").write("1")
            sys.stderr.write("CUDA out of memory (mock)\\n")
            sys.exit(1)
        random.seed(a.seed)
        os.makedirs(os.path.join(a.out_folder, "seqs"), exist_ok=True)
        aa = {AA!r}
        with open(os.path.join(a.out_folder, "seqs", "design.fa"), "w") as f:
            f.write(">input\\n" + "A" * {n_res} + "\\n")
            for i in range(a.num_seq_per_target):
                seq = "".join(random.choice(aa) for _ in range({n_res}))
                f.write(f">sample_{{i}}\\n{{seq}}\\n")
        """))
    return script


def _stub_refolder(design_ca, noise, seed=0):
    """Deterministic ESMFold stand-in: the design plus gaussian noise —
    small noise => designable (scRMSD < 2 A), large => not."""
    rng = np.random.default_rng(seed)

    def refold(seq):
        return design_ca + rng.normal(size=design_ca.shape) * noise

    return refold


@pytest.fixture()
def chain(tmp_path):
    design_ca = _helix_ca()
    pdb = tmp_path / "design_0.pdb"
    pdb.write_text("MOCK PDB (the mock CLI never reads it)\n")
    script = _write_mock_mpnn(tmp_path, n_res=len(design_ca))
    cfg = SelfConsistencyConfig(
        seqs_per_backbone=4,
        protein_mpnn_cmd=f"{sys.executable} {script}",
        retry_delay=0.01,
    )
    return design_ca, str(pdb), cfg, tmp_path


def test_chain_end_to_end_with_retry_and_csv(chain):
    design_ca, pdb, cfg, tmp_path = chain
    csv_path = str(tmp_path / "sc_results.csv")
    res = run_self_consistency(
        design_ca, pdb, cfg, csv_path=csv_path,
        refolder=_stub_refolder(design_ca, noise=0.2),
    )
    # both stages ran; the first MPNN attempt failed and was retried
    assert res["mpnn"] and res["esmfold"]
    assert res["mpnn_attempts"] == 2
    assert len(res["rows"]) == cfg.seqs_per_backbone
    assert res["designable"] is True  # 0.2 A noise ~ 0.35 A scRMSD
    for row in res["rows"]:
        assert set(row) >= {
            "seq_idx", "sequence", "tm_score", "rmsd", "clashes",
            "ss_helix", "ss_strand", "ss_coil",
        }
        assert len(row["sequence"]) == len(design_ca)
        assert 0.0 < row["tm_score"] <= 1.0 and row["rmsd"] < 1.0

    # CSV schema matches the reference's sc_results.csv accumulation
    with open(csv_path) as f:
        rows = list(csv.DictReader(f))
    assert len(rows) == cfg.seqs_per_backbone
    assert set(rows[0]) >= {"pdb", "seq_idx", "sequence", "tm_score", "rmsd"}
    assert all(r["pdb"] == pdb for r in rows)


def test_chain_non_designable_and_aggregation(chain):
    """High-noise refolds -> not designable; rows from several backbones
    flow through designability() and novelty_table() exactly as the
    reference's CSV does through novel_proteins.ipynb."""
    design_ca, pdb, cfg, tmp_path = chain
    csv_path = str(tmp_path / "sc_results.csv")
    good = run_self_consistency(
        design_ca, pdb, cfg, csv_path=csv_path,
        refolder=_stub_refolder(design_ca, noise=0.2),
    )
    bad_pdb = str(tmp_path / "design_1.pdb")
    open(bad_pdb, "w").write("MOCK\n")
    bad = run_self_consistency(
        design_ca, bad_pdb, cfg, csv_path=csv_path,
        refolder=_stub_refolder(design_ca, noise=4.0, seed=1),
    )
    assert good["designable"] and not bad["designable"]
    # MPNN already succeeded once -> marker exists -> no retry the 2nd time
    assert bad["mpnn_attempts"] == 1

    with open(csv_path) as f:
        rows = list(csv.DictReader(f))
    assert len(rows) == 2 * cfg.seqs_per_backbone
    d = novelty.designability(rows)
    assert d["n"] == 2 and d["rate"] == 0.5
    assert d["per_pdb"][pdb]["designable"]
    assert not d["per_pdb"][bad_pdb]["designable"]

    tbl = novelty.novelty_table(
        rows, novelty_tm={os.path.basename(pdb): 0.25,
                          os.path.basename(bad_pdb): 0.25},
    )
    assert tbl["designability_rate"] == 0.5
    # novel = designable AND tm < 0.3 -> only the good backbone
    assert tbl["novelty_rate"] == 0.5


def test_chain_exhausts_retries(tmp_path):
    """An MPNN CLI that always fails must raise after max_retries — the
    reference's bound at run_self_consistency.py:274-288."""
    design_ca = _helix_ca(8)
    pdb = tmp_path / "d.pdb"
    pdb.write_text("MOCK\n")
    script = tmp_path / "always_fail.py"
    script.write_text("import sys; sys.exit(1)\n")
    cfg = SelfConsistencyConfig(
        max_retries=3, retry_delay=0.01,
        protein_mpnn_cmd=f"{sys.executable} {script}",
    )
    with pytest.raises(RuntimeError, match="after 3 retries"):
        run_self_consistency(design_ca, str(pdb), cfg)
