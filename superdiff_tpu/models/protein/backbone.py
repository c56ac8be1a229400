"""Backbone geometry: rigid frames -> atom37 coordinates -> PDB text.

Replaces the reference's vendored openfold ``all_atom.to_atom37`` +
``protein.to_pdb`` chain (``composition.py:570-577,689-701``) with a compact
jnp/numpy implementation: idealized peptide geometry places N, CA, C (+ CB)
from each residue frame, the carbonyl O from the psi torsion (or an
idealized default), and a minimal PDB writer emits backbone records.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from . import rigid

Array = jax.Array

# Idealized backbone atom positions in the residue's local frame (angstroms),
# standard AF2 rigid-group geometry for the backbone group. Kept as host
# numpy: a module-level jnp.asarray would initialize the device backend at
# import time (even `--help` would then require a reachable chip — and on a
# dead tunnel relay the attach hangs forever instead of erroring).
IDEAL_N = np.asarray([-0.525, 1.363, 0.0], np.float32)
IDEAL_CA = np.asarray([0.0, 0.0, 0.0], np.float32)
IDEAL_C = np.asarray([1.526, 0.0, 0.0], np.float32)
IDEAL_CB = np.asarray([-0.529, -0.774, -1.205], np.float32)
# Idealized O relative to the C-frame before the psi rotation.
IDEAL_O = np.asarray([0.627, 1.062, 0.0], np.float32)

# atom37 slot indices (openfold residue_constants convention)
ATOM37_N, ATOM37_CA, ATOM37_C, ATOM37_CB, ATOM37_O = 0, 1, 2, 3, 4


def to_atom37(rigids7: Array, psi: Optional[Array] = None) -> Array:
    """Place backbone atoms from tensor-7 rigids.

    Args:
      rigids7: (..., n, 7) frames (translations in angstroms).
      psi: optional (..., n, 2) sin/cos of the psi torsion controlling the
        carbonyl-O placement; idealized trans placement when omitted.

    Returns (..., n, 37, 3) with N/CA/C/CB/O filled, rest zero.
    """
    rot = rigid.rigid_rotmat(rigids7)
    trans = rigid.rigid_trans(rigids7)

    def place(local):
        return jnp.einsum("...ij,j->...i", rot, local) + trans

    n_xyz, ca_xyz, c_xyz, cb_xyz = place(IDEAL_N), place(IDEAL_CA), place(IDEAL_C), place(IDEAL_CB)

    # O sits in the frame anchored at C, rotated about the CA->C axis by psi.
    if psi is None:
        sin_psi = jnp.zeros(rigids7.shape[:-1])
        cos_psi = -jnp.ones(rigids7.shape[:-1])  # idealized trans carbonyl
    else:
        norm = jnp.linalg.norm(psi, axis=-1, keepdims=True).clip(1e-6)
        p = psi / norm
        sin_psi, cos_psi = p[..., 0], p[..., 1]
    axis = c_xyz - ca_xyz
    axis = axis / jnp.linalg.norm(axis, axis=-1, keepdims=True).clip(1e-6)
    rotvec = axis * jnp.arctan2(sin_psi, cos_psi)[..., None]
    psi_rot = rigid.rotvec_to_rotmat(rotvec)
    o_local = jnp.einsum("...ij,j->...i", rot, IDEAL_O)
    o_xyz = c_xyz + jnp.einsum("...ij,...j->...i", psi_rot, o_local)

    out = jnp.zeros(rigids7.shape[:-1] + (37, 3), rigids7.dtype)
    out = out.at[..., ATOM37_N, :].set(n_xyz)
    out = out.at[..., ATOM37_CA, :].set(ca_xyz)
    out = out.at[..., ATOM37_C, :].set(c_xyz)
    out = out.at[..., ATOM37_CB, :].set(cb_xyz)
    out = out.at[..., ATOM37_O, :].set(o_xyz)
    return out


_BB_ATOMS = [("N", ATOM37_N, "N"), ("CA", ATOM37_CA, "C"), ("C", ATOM37_C, "C"),
             ("O", ATOM37_O, "O"), ("CB", ATOM37_CB, "C")]

_AA3 = [
    "ALA", "ARG", "ASN", "ASP", "CYS", "GLN", "GLU", "GLY", "HIS", "ILE",
    "LEU", "LYS", "MET", "PHE", "PRO", "SER", "THR", "TRP", "TYR", "VAL",
]


def to_pdb(
    atom37: np.ndarray,
    aatype: Optional[np.ndarray] = None,
    res_mask: Optional[np.ndarray] = None,
    b_factors: Optional[np.ndarray] = None,
    chain: str = "A",
) -> str:
    """Minimal PDB writer for backbone atoms (``protein.to_pdb`` role)."""
    atom37 = np.asarray(atom37)
    n = atom37.shape[0]
    aatype = np.zeros(n, np.int32) if aatype is None else np.asarray(aatype)
    res_mask = np.ones(n) if res_mask is None else np.asarray(res_mask)
    b = np.zeros(n) if b_factors is None else np.asarray(b_factors)
    lines, serial = [], 1
    for i in range(n):
        if res_mask[i] <= 0:
            continue
        res3 = _AA3[int(aatype[i]) % 20]
        for name, slot, elem in _BB_ATOMS:
            if name == "CB" and res3 == "GLY":
                continue
            x, y, z = atom37[i, slot]
            lines.append(
                f"ATOM  {serial:>5} {name:<4}{res3} {chain}{i + 1:>4}    "
                f"{x:8.3f}{y:8.3f}{z:8.3f}{1.0:6.2f}{b[i]:6.2f}          {elem:>2}"
            )
            serial += 1
    lines.append("TER")
    lines.append("END")
    return "\n".join(lines) + "\n"
