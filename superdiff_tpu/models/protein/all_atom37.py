"""All-atom37 geometry: torsions, idealized reconstruction, frame builders.

JAX ports of the openfold all-atom machinery the reference Proteus model
calls at inference (citations into /root/reference):

* ``proteus_openfold/data/data_transforms.py:925`` atom37_to_torsion_angles
* ``proteus_openfold/utils/feats.py:34`` pseudo_beta_fn
* ``proteus_openfold/utils/feats.py`` torsion_angles_to_frames /
  frames_and_literature_positions_to_atom14_pos / atom14_to_atom37
* ``proteus_openfold/utils/rigid_utils.py:1239`` from_3_points (Gram-Schmidt)
* ``proteus_openfold/utils/rigid_utils.py:1375`` make_transform_from_reference
  — including the vendored copy's quirk of writing the c2 z-row into c1_rots
  (both reference openfold copies share it; parity requires reproducing it).
* ``data_transforms.make_atom14_masks`` via precomputed per-restype tables.

Frames here are plain (rot (..., 3, 3), trans (..., 3)) tuples — functional,
vmap-friendly, no Rigid object.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from . import residue_constants as rc

Array = jax.Array


def pseudo_beta_fn(aatype: Array, atom37: Array, atom37_mask):
    """CB position (CA for glycine); optional mask."""
    is_gly = aatype == rc.GLY_IDX
    beta = jnp.where(is_gly[..., None], atom37[..., rc.CA_IDX, :], atom37[..., rc.CB_IDX, :])
    if atom37_mask is None:
        return beta
    mask = jnp.where(is_gly, atom37_mask[..., rc.CA_IDX], atom37_mask[..., rc.CB_IDX])
    return beta, mask


def from_3_points(p_neg_x_axis: Array, origin: Array, p_xy_plane: Array,
                  eps: float = 1e-8):
    """Gram-Schmidt frame construction (Alg. 21). Returns (rot, trans)."""
    e0 = origin - p_neg_x_axis
    e1 = p_xy_plane - origin
    e0 = e0 / jnp.sqrt(jnp.sum(e0**2, axis=-1, keepdims=True) + eps)
    dot = jnp.sum(e0 * e1, axis=-1, keepdims=True)
    e1 = e1 - e0 * dot
    e1 = e1 / jnp.sqrt(jnp.sum(e1**2, axis=-1, keepdims=True) + eps)
    e2 = jnp.cross(e0, e1)
    rot = jnp.stack([e0, e1, e2], axis=-1)  # columns are e0,e1,e2
    return rot, origin


def make_transform_from_reference(n_xyz: Array, ca_xyz: Array, c_xyz: Array,
                                  eps: float = 1e-20):
    """Reference-frame construction matching the vendored openfold copies
    EXACTLY — including their quirk of assigning the second rotation's z-row
    into ``c1_rots`` before the matmul (rigid_utils.py:1405-1423)."""
    t = -ca_xyz
    n = n_xyz + t
    c = c_xyz + t
    c_x, c_y, c_z = c[..., 0], c[..., 1], c[..., 2]
    norm = jnp.sqrt(eps + c_x**2 + c_y**2)
    sin_c1, cos_c1 = -c_y / norm, c_x / norm
    zeros = jnp.zeros_like(sin_c1)
    ones = jnp.ones_like(sin_c1)
    norm2 = jnp.sqrt(eps + c_x**2 + c_y**2 + c_z**2)
    sin_c2, cos_c2 = c_z / norm2, jnp.sqrt(c_x**2 + c_y**2) / norm2
    # NOTE: rows 2 of "c1_rots" are overwritten with the c2 terms (the quirk)
    c1_rots = jnp.stack(
        [cos_c1, -sin_c1, zeros,
         sin_c1, cos_c1, zeros,
         -sin_c2, zeros, cos_c2], axis=-1,
    ).reshape(sin_c1.shape + (3, 3))
    c2_rots = jnp.stack(
        [cos_c2, zeros, sin_c2,
         zeros, ones, zeros,
         zeros, zeros, zeros], axis=-1,
    ).reshape(sin_c1.shape + (3, 3))
    c_rots = c2_rots @ c1_rots
    n2 = jnp.einsum("...ij,...j->...i", c_rots, n)
    norm3 = jnp.sqrt(eps + n2[..., 1] ** 2 + n2[..., 2] ** 2)
    sin_n, cos_n = -n2[..., 2] / norm3, n2[..., 1] / norm3
    n_rots = jnp.stack(
        [ones, zeros, zeros,
         zeros, cos_n, -sin_n,
         zeros, sin_n, cos_n], axis=-1,
    ).reshape(sin_c1.shape + (3, 3))
    rots = jnp.swapaxes(n_rots @ c_rots, -1, -2)
    return rots, ca_xyz


def atom37_to_torsion_angles(aatype: Array, atom37: Array, atom37_mask: Array):
    """Returns (torsion_sin_cos (..., 7, 2), alt (..., 7, 2), mask (..., 7))."""
    aatype = jnp.clip(aatype, max=20)
    prev_pos = jnp.concatenate(
        [jnp.zeros_like(atom37[..., :1, :, :]), atom37[..., :-1, :, :]], axis=-3
    )
    prev_mask = jnp.concatenate(
        [jnp.zeros_like(atom37_mask[..., :1, :]), atom37_mask[..., :-1, :]], axis=-2
    )
    pre_omega = jnp.concatenate(
        [prev_pos[..., 1:3, :], atom37[..., :2, :]], axis=-2
    )
    phi = jnp.concatenate([prev_pos[..., 2:3, :], atom37[..., :3, :]], axis=-2)
    psi = jnp.concatenate([atom37[..., :3, :], atom37[..., 4:5, :]], axis=-2)
    pre_omega_mask = jnp.prod(prev_mask[..., 1:3], axis=-1) * jnp.prod(
        atom37_mask[..., :2], axis=-1
    )
    phi_mask = prev_mask[..., 2] * jnp.prod(atom37_mask[..., :3], axis=-1)
    psi_mask = jnp.prod(atom37_mask[..., :3], axis=-1) * atom37_mask[..., 4]

    chi_idx = jnp.asarray(rc.chi_atom_indices)[aatype]  # (..., 4, 4)
    chis_pos = _gather_atoms(atom37, chi_idx)  # (..., 4, 4, 3)
    chis_atom_mask = jnp.prod(_gather_mask(atom37_mask, chi_idx), axis=-1)
    chi_mask_table = jnp.concatenate(
        [jnp.asarray(rc.chi_angles_mask), jnp.zeros((1, 4))], axis=0
    )
    chis_mask = chi_mask_table[aatype] * chis_atom_mask

    torsions_pos = jnp.concatenate(
        [pre_omega[..., None, :, :], phi[..., None, :, :], psi[..., None, :, :],
         chis_pos],
        axis=-3,
    )  # (..., 7, 4, 3)
    torsion_mask = jnp.concatenate(
        [pre_omega_mask[..., None], phi_mask[..., None], psi_mask[..., None],
         chis_mask],
        axis=-1,
    )
    rot, trans = from_3_points(
        torsions_pos[..., 1, :], torsions_pos[..., 2, :], torsions_pos[..., 0, :]
    )
    # invert().apply(p) = R^T (p - t)
    rel = jnp.einsum(
        "...ji,...j->...i", rot, torsions_pos[..., 3, :] - trans
    )
    sin_cos = jnp.stack([rel[..., 2], rel[..., 1]], axis=-1)
    denom = jnp.sqrt(jnp.sum(sin_cos**2, axis=-1, keepdims=True) + 1e-8)
    sin_cos = sin_cos / denom
    sin_cos = sin_cos * jnp.asarray([1.0, 1.0, -1.0, 1.0, 1.0, 1.0, 1.0])[..., None]
    chi_amb = jnp.asarray(rc.chi_pi_periodic)[aatype]
    mirror = jnp.concatenate(
        [jnp.ones(aatype.shape + (3,)), 1.0 - 2.0 * chi_amb], axis=-1
    )
    alt = sin_cos * mirror[..., None]
    return sin_cos, alt, torsion_mask


def _gather_atoms(atom37: Array, idx: Array) -> Array:
    """atom37 (..., N, 37, 3), idx (..., N, 4, 4) -> (..., N, 4, 4, 3)."""
    return jnp.take_along_axis(
        atom37[..., None, :, :], idx[..., None], axis=-2
    )


def _gather_mask(mask: Array, idx: Array) -> Array:
    """mask (..., N, 37), idx (..., N, 4, 4) -> (..., N, 4, 4)."""
    return jnp.take_along_axis(mask[..., None, :], idx, axis=-1)


def make_atom14_masks(aatype: Array) -> dict:
    """Per-residue atom14/atom37 index maps and existence masks."""
    aatype = jnp.clip(aatype, max=20)
    return {
        "residx_atom14_to_atom37": jnp.asarray(rc.restype_atom14_to_atom37)[aatype],
        "residx_atom37_to_atom14": jnp.asarray(rc.restype_atom37_to_atom14)[aatype],
        "atom14_atom_exists": jnp.asarray(rc.restype_atom14_exists)[aatype],
        "atom37_atom_exists": jnp.asarray(rc.STANDARD_ATOM_MASK)[aatype],
    }


def _compose(f1, f2):
    """(rot, trans) composition: f1 after f2? — standard r1 ∘ r2."""
    r1, t1 = f1
    r2, t2 = f2
    return r1 @ r2, jnp.einsum("...ij,...j->...i", r1, t2) + t1


def torsion_angles_to_frames(rot: Array, trans: Array, alpha: Array, aatype: Array):
    """openfold feats.torsion_angles_to_frames: 8 rigid-group frames.

    rot/trans: backbone frames (..., 3, 3)/(..., 3); alpha (..., 7, 2)
    [sin, cos]; returns (rot8 (..., 8, 3, 3), trans8 (..., 8, 3))."""
    default_4x4 = jnp.asarray(rc.restype_rigid_group_default_frame)[aatype]
    def_rot = default_4x4[..., :3, :3]
    def_trans = default_4x4[..., :3, 3]
    bb_rot = jnp.zeros(alpha.shape[:-2] + (1, 2)).at[..., 1].set(1.0)
    alpha = jnp.concatenate([bb_rot, alpha], axis=-2)  # (..., 8, 2)
    sin_a, cos_a = alpha[..., 0], alpha[..., 1]
    zeros = jnp.zeros_like(sin_a)
    ones = jnp.ones_like(sin_a)
    x_rot = jnp.stack(
        [ones, zeros, zeros,
         zeros, cos_a, -sin_a,
         zeros, sin_a, cos_a], axis=-1,
    ).reshape(sin_a.shape + (3, 3))
    rot8, trans8 = _compose((def_rot, def_trans), (x_rot, jnp.zeros(sin_a.shape + (3,))))
    # chain chi frames: chi2 <- chi1, chi3 <- chi2, chi4 <- chi3
    chi1 = (rot8[..., 4, :, :], trans8[..., 4, :])
    chi2 = _compose(chi1, (rot8[..., 5, :, :], trans8[..., 5, :]))
    chi3 = _compose(chi2, (rot8[..., 6, :, :], trans8[..., 6, :]))
    chi4 = _compose(chi3, (rot8[..., 7, :, :], trans8[..., 7, :]))
    rot_all = jnp.concatenate(
        [rot8[..., :5, :, :], chi2[0][..., None, :, :], chi3[0][..., None, :, :],
         chi4[0][..., None, :, :]], axis=-3,
    )
    trans_all = jnp.concatenate(
        [trans8[..., :5, :], chi2[1][..., None, :], chi3[1][..., None, :],
         chi4[1][..., None, :]], axis=-2,
    )
    # compose with global backbone frame
    g_rot = jnp.einsum("...ij,...gjk->...gik", rot, rot_all)
    g_trans = jnp.einsum("...ij,...gj->...gi", rot, trans_all) + trans[..., None, :]
    return g_rot, g_trans


def frames_to_atom14_pos(rot8: Array, trans8: Array, aatype: Array) -> Array:
    """Idealized atom14 positions from the 8 rigid-group frames."""
    group_idx = jnp.asarray(rc.restype_atom14_to_rigid_group)[aatype]  # (..., 14)
    group_mask = jax.nn.one_hot(group_idx, 8)  # (..., 14, 8)
    r_atom = jnp.einsum("...ag,...gij->...aij", group_mask, rot8)
    t_atom = jnp.einsum("...ag,...gi->...ai", group_mask, trans8)
    lit = jnp.asarray(rc.restype_atom14_rigid_group_positions)[aatype]  # (..., 14, 3)
    pred = jnp.einsum("...aij,...aj->...ai", r_atom, lit) + t_atom
    return pred * jnp.asarray(rc.restype_atom14_mask)[aatype][..., None]


def atom14_to_atom37(atom14: Array, aatype: Array) -> Array:
    """Scatter atom14 positions into the atom37 layout."""
    maps = make_atom14_masks(aatype)
    idx = maps["residx_atom37_to_atom14"]  # (..., 37)
    a37 = jnp.take_along_axis(atom14, idx[..., None], axis=-2)
    return a37 * maps["atom37_atom_exists"][..., None]
