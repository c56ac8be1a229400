"""SE(3) denoising score-matching: train the IPA score networks on TPU.

Mesh-era replacement for the vendored FrameDiff training
(``se3diff_experiments/train_se3_diffusion.py``, torch DDP/NCCL): the SE(3)
DSM loss samples a forward-noised rigid per residue and regresses both
component scores, normalized by the per-t score scalings (the reference's
loss weighting, ``train_se3_diffusion.py:524`` role). Data parallelism is
jit+NamedSharding via ``train.make_train_step``.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from ..models.protein import rigid
from ..models.protein.se3 import SE3Diffuser

Array = jax.Array


def se3_forward_marginal(
    key: Array, diffuser: SE3Diffuser, rigids_0: Array, t
):
    """Sample rigids_t ~ p(.|rigids_0) and the regression-target scores.

    ``t``: scalar or (B,) per-sample times for rigids_0 of shape (B, N, 7).
    Targets come from the same ``calc_*_score`` adapters the inference path
    uses, guaranteeing train/sample consistency under this framework's
    conventions.
    """
    k_tr, k_ro = jax.random.split(key)
    t = jnp.asarray(t)
    t_res = t.reshape(t.shape + (1,) * (rigids_0.ndim - 1 - t.ndim))  # (B,1)
    t_xyz = t_res[..., None]  # (B,1,1)
    trans_0 = rigid.rigid_trans(rigids_0)
    trans_t_unscaled, trans_score = diffuser.r3.forward_marginal(k_tr, trans_0, t_xyz)
    rotvec = diffuser.so3.sample(k_ro, t_res, rigids_0.shape[:-1])
    rot_0 = rigid.rigid_rotmat(rigids_0)
    rot_t = rot_0 @ rigid.rotvec_to_rotmat(rotvec)
    rot_score = diffuser.calc_rot_score(rot_t, rot_0, t_res)
    rigids_t = rigid.rigid(rigid.rotmat_to_quat(rot_t), trans_t_unscaled)
    return rigids_t, trans_score, rot_score


def make_se3_dsm_loss(
    apply_fn: Callable[..., dict],
    diffuser: SE3Diffuser,
    *,
    min_t: float = 0.01,
    trans_weight: float = 1.0,
    rot_weight: float = 1.0,
):
    """DSM loss closure compatible with ``train.make_train_step``.

    ``apply_fn(params, feats, rng)`` -> model output dict with
    ``trans_score`` / ``rot_score``. Batch: {"rigids_0": (B,N,7),
    "res_mask": (B,N), "seq_idx": (B,N)}.
    """

    def loss_fn(key, params, sampler_state, batch):
        rigids_0 = batch["rigids_0"]
        mask = batch["res_mask"]
        b = rigids_0.shape[0]
        k_t, k_fwd, k_drop = jax.random.split(key, 3)
        t = jax.random.uniform(k_t, (b, 1), minval=min_t, maxval=1.0)
        rigids_t, tgt_trans, tgt_rot = se3_forward_marginal(
            k_fwd, diffuser, rigids_0, t[:, 0]
        )
        feats = {
            "rigids_t": rigids_t,
            "res_mask": mask,
            "fixed_mask": jnp.zeros_like(mask),
            "t": t[:, 0],
            "seq_idx": batch["seq_idx"],
            "sc_ca_t": jnp.zeros_like(rigid.rigid_trans(rigids_t)),
        }
        out = apply_fn(params, feats, k_drop)
        rot_scale, trans_scale = diffuser.score_scaling(t[..., None])
        m = mask[..., None]
        tr_err = ((out["trans_score"] - tgt_trans) / trans_scale) ** 2 * m
        ro_err = ((out["rot_score"] - tgt_rot) / rot_scale) ** 2 * m
        denom = jnp.maximum(m.sum(), 1.0)
        loss = trans_weight * tr_err.sum() / denom + rot_weight * ro_err.sum() / denom
        return loss, sampler_state

    return loss_fn
