"""Structural metrics: Kabsch-aligned RMSD, TM-score, clash counting.

Replaces the reference's tmtools/mdtraj dependencies
(``evaluation/analysis/metrics.py:44-73,127-130``) with self-contained numpy.
For self-consistency evaluation the designed and refolded backbones share a
sequence, so the residue correspondence is the identity — superposition-based
TM-score over that correspondence matches the tmtools usage there.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np


def kabsch(P: np.ndarray, Q: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Optimal rotation R and translation t minimizing ||R P + t - Q||."""
    pc, qc = P.mean(0), Q.mean(0)
    P0, Q0 = P - pc, Q - qc
    H = P0.T @ Q0
    U, _, Vt = np.linalg.svd(H)
    d = np.sign(np.linalg.det(Vt.T @ U.T))
    D = np.diag([1.0, 1.0, d])
    R = Vt.T @ D @ U.T
    t = qc - R @ pc
    return R, t


def aligned_rmsd(P: np.ndarray, Q: np.ndarray) -> float:
    """Kabsch-aligned RMSD over corresponding points (scRMSD,
    ``metrics.py:71-73``)."""
    R, t = kabsch(P, Q)
    diff = (P @ R.T + t) - Q
    return float(np.sqrt((diff**2).sum(-1).mean()))


def tm_score(P: np.ndarray, Q: np.ndarray, l_target: int | None = None) -> float:
    """TM-score under the Kabsch superposition with identity correspondence.

    d0(L) = 1.24 (L-15)^(1/3) - 1.8 (Zhang & Skolnick 2004). For identical
    sequences this matches the tmtools-based scTM (``metrics.py:44-46``).
    """
    n = len(P)
    L = l_target or n
    R, t = kabsch(P, Q)
    d = np.sqrt((((P @ R.T + t) - Q) ** 2).sum(-1))
    d0 = max(1.24 * (L - 15) ** (1.0 / 3.0) - 1.8, 0.5)
    return float(np.mean(1.0 / (1.0 + (d / d0) ** 2)))


def ca_ca_clashes(ca: np.ndarray, cutoff: float = 3.0) -> int:
    """Count non-bonded CA pairs (|i-j| >= 2) closer than ``cutoff`` angstrom
    (steric-clash screen, ``metrics.py:127-130`` role)."""
    d = np.linalg.norm(ca[:, None] - ca[None, :], axis=-1)
    iu = np.triu_indices(len(ca), k=2)  # skip self + bonded neighbors
    return int((d[iu] < cutoff).sum())


def radius_of_gyration(ca: np.ndarray) -> float:
    c = ca - ca.mean(0)
    return float(np.sqrt((c**2).sum(-1).mean()))


def secondary_structure_fractions(ca: np.ndarray) -> dict:
    """Coarse helix/strand fractions from CA virtual dihedrals (mdtraj-free
    stand-in for ``calc_mdtraj_metrics``): helices show ~50 deg CA dihedrals
    and ~5.5 A i,i+3 distances; strands are extended (> 9.8 A i,i+3)."""
    n = len(ca)
    if n < 4:
        return {"helix": 0.0, "strand": 0.0, "coil": 1.0}
    d13 = np.linalg.norm(ca[3:] - ca[:-3], axis=-1)
    helix = (d13 < 7.0).mean()
    strand = (d13 > 9.8).mean()
    return {
        "helix": float(helix),
        "strand": float(strand),
        "coil": float(1.0 - helix - strand),
    }
