"""SE(3) protein-backbone SuperDiff: compose two score networks on TPU.

Rebuild of the reference ``CompositionDiffusion``
(``applications/proteins/superdiff/composition.py``): two heterogeneous
SE(3) score models sampled along ONE reverse trajectory, with a separate
mixing weight kappa and running Itô log-likelihood per *component*
(translations in R^3, rotations in SO(3)) and per model
(``composition.py:178-181,436-443``). Operators: OR (softmax over running
lls with per-component temperature/bias) and AND (closed-form density
equalization with sigma-normalized lift), plus fixed-kappa ``mixture`` and
single-model baselines (``composition.py:146,498-510``).

TPU-first: the 500-step loop is one ``lax.scan``; both models' forwards,
the kappa solve, the EM steps and the dll updates compile into a single XLA
program. Self-conditioning carries (each model's previous prediction) ride
in the scan carry (SURVEY.md §7 "heterogeneous two-model placement").
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core import ito
from ..core.kappa import kappa_or, normalized_log_sigma
from ..models.protein import rigid
from ..models.protein.backbone import to_atom37
from ..models.protein.se3 import SE3Diffuser

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class CompositionConfig:
    """Defaults of ``superdiff/config/composition.yaml:7-27,133-152``."""

    num_t: int = 500
    min_t: float = 0.002
    mixing_method: str = "composition"  # composition|mixture|baseline_a|baseline_b
    kappa_operator: str = "OR"  # OR | AND
    kappa_fixed: float = 0.5
    temp_trans: float = 1.0
    temp_rots: float = 1.0
    logp_trans: float = 0.0
    logp_rots: float = 0.0
    # the reference composition reads ``experiment.noise_scale`` —
    # shipped value 0.1 (composition.yaml:463, read at composition.py:169;
    # the yaml's own save_path is named framediff_deterministic_ns0.1)
    noise_scale: float = 0.1
    # reference ships the deterministic (probability-flow) sampler by
    # default: composition.yaml:17 ``stochastic: False`` (the CLI
    # ``--stochastic`` store_true flag matches; tests/test_protein_config.py
    # pins every shared default against the yaml)
    stochastic: bool = False
    center: bool = True
    # fraction of steps on which the proteus-role model gets sequence
    # conditioning (struct2seq/ESM gating sub-schedule,
    # ``composition.py:184-187,446-449``); 0 disables (the shipped default).
    esm_rate: float = 0.0


ModelFn = Callable[[dict, Array], dict]
# (feats, sc_ca_t) -> {"trans_score", "rot_score", "pred_trans", ...}


def _dx_ind_trans(f_x, score_b, beta_t, dt, noise):
    """The step model-b-alone would take (AND kappa reference point,
    ``composition.py:405-406``)."""
    return -dt * (f_x - 2.0 * beta_t * score_b) + noise


def _kappa_and(score_a, score_b, dx_ind, f_x, beta_t, dt, lift_term):
    """Closed-form AND kappa for one component (``composition.py:378-420``):
    equalizes the divergence-free dll increments of the two models. Returns
    per-batch scalars (B,). fp32 where the reference casts to fp64
    (``composition.py:379-380``) — validated: max |dkappa| vs an fp64 twin
    is ~1e-4 over the full 500-step schedule at N=512, worst case included
    (``tests/test_kappa_precision.py``), because ``d = a - b`` is formed
    elementwise before any reduction."""
    a = score_a.astype(jnp.float32)
    b = score_b.astype(jnp.float32)
    d = a - b
    ev = tuple(range(1, d.ndim))
    num = -dt * beta_t * jnp.sum(d * (a + b), ev)
    num = num + jnp.sum((dx_ind + dt * f_x) * d, ev)
    den = 2.0 * dt * beta_t * jnp.sum(d * d, ev)
    # degenerate case: identical scores make kappa irrelevant — any mix gives
    # the same field; return 0.5 instead of 0/0.
    safe = jnp.maximum(den, 1e-12)
    return jnp.where(den > 1e-12, -(num / safe) + lift_term / safe, 0.5)


def compose(
    key: Array,
    model_a: ModelFn,
    model_b: ModelFn,
    diffuser: SE3Diffuser,
    n_res: int,
    cfg: CompositionConfig = CompositionConfig(),
    batch: int = 1,
    init_rigids: Optional[Array] = None,
    res_mask: Optional[Array] = None,
    fixed_mask: Optional[Array] = None,
    sc_adapter_a: Optional[tuple] = None,
    sc_adapter_b: Optional[tuple] = None,
) -> dict:
    """Run the composed reverse trajectory; returns final rigids + traces.

    ``model_a`` plays the Proteus role (kappa weights it), ``model_b`` the
    FrameDiff role. Both receive the same feature dict plus their own
    self-conditioning carry.

    ``sc_adapter_*``: optional ``(sc_init, sc_update)`` pair customizing the
    self-conditioning carry — ``sc_init(init_rigids) -> pytree`` and
    ``sc_update(model_out) -> pytree``. The default carries predicted CA
    positions as ``sc_ca_t`` (the FrameDiff convention,
    ``composition.py:251-252``); the faithful Proteus model instead carries
    its full atom37 output as the next step's template self-condition
    (``one_step_proteus``, ``composition.py:209-218``). Non-array carries
    are delivered to the model under ``feats['self_cond']``.
    """
    r3, so3 = diffuser.r3, diffuser.so3
    reverse_steps = np.linspace(cfg.min_t, 1.0, cfg.num_t)[::-1]
    # the reference only *steps* while t > min_t (composition.py:498);
    # scan over the strictly-greater prefix.
    ts = jnp.asarray(reverse_steps[:-1].copy(), jnp.float32)
    dt = jnp.float32(1.0 / cfg.num_t)

    key, init_key = jax.random.split(key)
    if init_rigids is None:
        init_rigids = diffuser.sample_ref(init_key, n_res, batch)
    mask = jnp.ones((batch, n_res)) if res_mask is None else res_mask
    fmask = jnp.zeros((batch, n_res)) if fixed_mask is None else fixed_mask
    diffuse_mask = (1.0 - fmask) * mask
    seq_idx = jnp.broadcast_to(jnp.arange(n_res)[None], (batch, n_res))

    sigma_w_trans = lambda t: normalized_log_sigma(
        jnp.sqrt(r3.b_t(t)), jnp.sqrt(r3.min_b), jnp.sqrt(r3.max_b), n_res * 3
    )
    sigma_w_rots = lambda t: normalized_log_sigma(
        so3.sigma(t), so3.min_sigma, so3.max_sigma, n_res * 3
    )

    # struct2seq gating: evenly-spaced subset of steps is flagged True for
    # the proteus-role model (reverse_steps_esm construction)
    num_esm = int(cfg.esm_rate * cfg.num_t)
    esm_flags = np.zeros(cfg.num_t, dtype=np.float32)
    if num_esm > 0:
        esm_flags[np.linspace(0, cfg.num_t - 1, num_esm, dtype=int)] = 1.0
    esm_flags = jnp.asarray(esm_flags[: cfg.num_t - 1])

    def feats_for(rigids_t, t, sc, struct2seq=None):
        f = {
            "rigids_t": rigids_t,
            "res_mask": mask,
            "fixed_mask": fmask,
            "t": jnp.full((batch,), t),
            "seq_idx": seq_idx,
        }
        if isinstance(sc, jax.Array):
            f["sc_ca_t"] = sc
        else:
            f["self_cond"] = sc
        if struct2seq is not None:
            f["struct2seq"] = struct2seq
        return f

    zeros_ll = jnp.zeros((batch,), jnp.float32)

    def body(carry, inp):
        rigids_t, sc_a, sc_b, ll_a_tr, ll_b_tr, ll_a_ro, ll_b_ro = carry
        i, t, s2s = inp
        step_key = jax.random.fold_in(key, i)
        k_eps, k_rev = jax.random.split(step_key)

        out_a = model_a(feats_for(rigids_t, t, sc_a, struct2seq=s2s), t)
        out_b = model_b(feats_for(rigids_t, t, sc_b), t)
        s_a_tr, s_b_tr = out_a["trans_score"], out_b["trans_score"]
        s_a_ro, s_b_ro = out_a["rot_score"], out_b["rot_score"]

        x_tr = r3.scale(rigid.rigid_trans(rigids_t))
        eps = cfg.noise_scale * jax.random.normal(k_eps, x_tr.shape)
        beta_tr = 0.5 * r3.diffusion_coef(t) ** 2
        beta_ro = 0.5 * so3.diffusion_coef(t) ** 2
        f_x = r3.drift_coef(x_tr, t)
        noise_tr = jnp.sqrt(2.0 * beta_tr * dt) * eps
        noise_ro = jnp.sqrt(2.0 * beta_ro * dt) * eps  # same eps: parity with
        # composition.py:517-520, which reuses one draw for both components.

        if cfg.mixing_method == "baseline_a":
            k_tr = k_ro = jnp.ones((batch,), jnp.float32)
        elif cfg.mixing_method == "baseline_b":
            k_tr = k_ro = jnp.zeros((batch,), jnp.float32)
        elif cfg.mixing_method == "mixture":
            k_tr = k_ro = jnp.full((batch,), cfg.kappa_fixed, jnp.float32)
        elif cfg.kappa_operator == "OR":
            k_tr = kappa_or(ll_a_tr, ll_b_tr, cfg.temp_trans, cfg.logp_trans)
            k_ro = kappa_or(ll_a_ro, ll_b_ro, cfg.temp_rots, cfg.logp_rots)
        else:  # AND
            dx_ind = _dx_ind_trans(f_x, s_b_tr, beta_tr, dt, noise_tr)
            lift_tr = cfg.logp_trans * sigma_w_trans(t) / cfg.num_t
            k_tr = _kappa_and(s_a_tr, s_b_tr, dx_ind, f_x, beta_tr, dt, lift_tr)
            dx_ind_ro = _dx_ind_trans(0.0, s_b_ro, beta_ro, dt, noise_ro)
            lift_ro = cfg.logp_rots * sigma_w_rots(t) / cfg.num_t
            k_ro = _kappa_and(s_a_ro, s_b_ro, dx_ind_ro, 0.0, beta_ro, dt, lift_ro)

        kt = k_tr[:, None, None]
        kr = k_ro[:, None, None]
        mixed_tr = s_b_tr + kt * (s_a_tr - s_b_tr)
        mixed_ro = s_b_ro + kr * (s_a_ro - s_b_ro)
        # EM steps in the scaled/tangent spaces (composition.py:515-520)
        dx_tr = -dt * (f_x - 2.0 * beta_tr * mixed_tr) + noise_tr
        dx_ro = dt * 2.0 * beta_ro * mixed_ro + noise_ro

        # divergence-free dll per model per component (compute_stoch_dll)
        dll_tr = ito.dlogq_sde_r3(
            jnp.stack([s_a_tr, s_b_tr]), x_tr, dx_tr, f_x,
            beta_tr, -0.5 * r3.b_t(t), dt,
        )
        dll_ro = ito.dlogq_sde_driftless(
            jnp.stack([s_a_ro, s_b_ro]), dx_ro, beta_ro, dt
        )
        new_ll = (
            ll_a_tr + dll_tr[:, 0], ll_b_tr + dll_tr[:, 1],
            ll_a_ro + dll_ro[:, 0], ll_b_ro + dll_ro[:, 1],
        )

        new_rigids = diffuser.reverse(
            k_rev, rigids_t, mixed_ro, mixed_tr, t, dt,
            stochastic=cfg.stochastic, noise_scale=cfg.noise_scale,
            diffuse_mask=diffuse_mask, center=cfg.center,
            dx_trans=dx_tr, dx_rots=dx_ro,
        )
        new_sc_a = (sc_adapter_a[1](out_a) if sc_adapter_a
                    else out_a["pred_trans"])
        new_sc_b = (sc_adapter_b[1](out_b) if sc_adapter_b
                    else out_b["pred_trans"])
        trace = {
            "kappa_trans": k_tr, "kappa_rots": k_ro,
            "ll_a_trans": new_ll[0], "ll_b_trans": new_ll[1],
            "ll_a_rots": new_ll[2], "ll_b_rots": new_ll[3],
            "rigids": new_rigids,
        }
        return (new_rigids, new_sc_a, new_sc_b, *new_ll), trace

    sc0 = rigid.rigid_trans(init_rigids)
    sc_a0 = sc_adapter_a[0](init_rigids) if sc_adapter_a else sc0
    sc_b0 = sc_adapter_b[0](init_rigids) if sc_adapter_b else sc0
    carry0 = (init_rigids, sc_a0, sc_b0, zeros_ll, zeros_ll, zeros_ll, zeros_ll)
    steps = (jnp.arange(cfg.num_t - 1), ts, esm_flags)
    (final_rigids, *_), traces = jax.lax.scan(body, carry0, steps)

    atom37 = to_atom37(final_rigids)
    return {
        "rigids": final_rigids,
        "atom37": atom37,
        "traces": traces,
        "init_rigids": init_rigids,
    }
