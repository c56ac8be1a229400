"""SE(3) diffuser: R^3 translations x IGSO(3) rotations.

Rebuild of the reference ``SE3Diffuser`` (``se3diff_data/se3_diffuser.py``):
sample_ref noise rigids, score scaling, and the reverse step with the
external-``dx`` injection seam that SuperDiff drives
(``se3_diffuser.py:161-219``, ``composition.py:545-556``). Rigids use the
tensor-7 layout of ``rigid.py``.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from . import rigid
from .r3 import R3Diffuser
from .so3 import SO3Diffuser

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class SE3Diffuser:
    r3: R3Diffuser
    so3: SO3Diffuser
    diffuse_trans: bool = True
    diffuse_rot: bool = True

    @staticmethod
    def default() -> "SE3Diffuser":
        return SE3Diffuser(r3=R3Diffuser(), so3=SO3Diffuser())

    def score_scaling(self, t) -> Tuple[Array, Array]:
        return self.so3.score_scaling(t), self.r3.score_scaling(t)

    def sample_ref(self, key: Array, n_res: int, batch: int = 1) -> Array:
        """Reference (t=1) noise rigids: IGSO3(1) rotations + N(0,I) scaled
        translations (``se3_diffuser.py`` sample_ref)."""
        k1, k2 = jax.random.split(key)
        rotvec = self.so3.sample_ref(k1, (batch, n_res))
        rotmat = rigid.rotvec_to_rotmat(rotvec)
        quat = rigid.rotmat_to_quat(rotmat)
        trans = self.r3.unscale(self.r3.sample_ref(k2, (batch, n_res)))
        return rigid.rigid(quat, trans)

    def calc_trans_score(self, trans_t, trans_0, t):
        return self.r3.calc_trans_score(trans_t, trans_0, t)

    def calc_rot_score(self, rotmats_t: Array, rotmats_0: Array, t) -> Array:
        """Score of the rotation component from a predicted clean rotation:
        IGSO3 score at the relative rotation R_t^T R_0 (FrameDiff convention)."""
        rel = jnp.swapaxes(rotmats_t, -1, -2) @ rotmats_0
        rotvec = rigid.rotmat_to_rotvec(rel)
        return self.so3.score(rotvec, t)

    def reverse(
        self,
        key: Array,
        rigids_t: Array,  # (..., 7)
        rot_score: Array,  # (..., 3)
        trans_score: Array,  # (..., 3) in scaled coordinates
        t,
        dt,
        *,
        stochastic: bool = False,
        noise_scale: float = 1.0,
        diffuse_mask: Optional[Array] = None,
        center: bool = True,
        dx_trans: Optional[Array] = None,  # externally-supplied EM steps
        dx_rots: Optional[Array] = None,  # (the SuperDiff seam)
    ) -> Array:
        """One reverse step on SE(3); external dx overrides the internal EM.

        Semantics parity: with ``dx_trans`` the translation update is
        ``x + dx`` (already a signed delta, ``r3_diffuser.py:152-153``);
        without, ``x - perturb``. Rotations compose on the right by the
        tangent update (``so3_diffuser.py:368-372``).
        """
        k_r, k_t = jax.random.split(key)
        trans_t = self.r3.scale(rigid.rigid_trans(rigids_t))

        if dx_trans is not None:
            trans_pert = dx_trans
        else:
            trans_pert = -self.r3.reverse_perturbation(
                k_t, trans_t, trans_score, t, dt,
                stochastic=stochastic, noise_scale=noise_scale,
            )
        if dx_rots is not None:
            rot_pert = dx_rots
        else:
            rot_pert = self.so3.reverse_perturbation(
                k_r, rot_score, t, dt,
                stochastic=stochastic, noise_scale=noise_scale,
            )

        if diffuse_mask is not None:
            trans_pert = trans_pert * diffuse_mask[..., None]
            rot_pert = rot_pert * diffuse_mask[..., None]

        new_trans = trans_t + trans_pert
        if center:
            if diffuse_mask is None:
                com = new_trans.mean(axis=-2, keepdims=True)
            else:
                w = diffuse_mask[..., None]
                com = (new_trans * w).sum(axis=-2, keepdims=True) / jnp.maximum(
                    w.sum(axis=-2, keepdims=True), 1.0
                )
            new_trans = new_trans - com
        new_trans = self.r3.unscale(new_trans)

        rotmat = rigid.rigid_rotmat(rigids_t) @ rigid.rotvec_to_rotmat(rot_pert)
        return rigid.rigid(rigid.rotmat_to_quat(rotmat), new_trans)
