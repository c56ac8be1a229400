"""Stable-Diffusion SuperDiff pipeline: 2-prompt concept composition on TPU.

Rebuild of ``applications/images/clip_eval.py`` (the repo's SD application):
sigma-space integration over the EulerDiscrete grid, classifier-free
guidance, and the full method set

  ``and`` / ``or`` / ``avg``        — SDE composition (kappa AND / OR / fixed)
  ``and_ode`` / ``avg_ode``         — probability-flow composition
  ``sd_ab`` ``sd_ba`` ``sd_ab_or``
  ``sd_ba_or`` ``sd_a`` ``sd_b``    — single-prompt SD baselines

TPU-first design:

* The whole trajectory is one ``lax.scan`` (the reference dispatches 1000
  Python steps through the torch eager runtime).
* The 2-3 UNet evaluations per step (obj / bg / uncond conditioning of the
  *same* weights — SD composes conditionings, not checkpoints,
  ``clip_eval.py:354,394``) are fused into ONE batched forward of batch 3B:
  bigger matmuls on the MXU, one dispatch, weights read from HBM once.
* ``and_ode``'s two Hutchinson divergences come from a single ``jax.jvp``
  through that same batched call with a zero tangent on the uncond slice.
* kappa and the running log-likelihoods accumulate in float32; per-step
  kappa / ll traces are returned as scan outputs (the reference streams them
  to wandb per step, ``clip_eval.py:415``).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core import kappa as kp
from ..core import ito
from ..core.schedules import SigmaGrid
from ..models.sd.clip import CLIPTextConfig, CLIPTextEncoder, Tokenizer
from ..models.sd.unet import SDUNet, SDUNetConfig
from ..models.sd.vae import VAEConfig, VAEDecoder, decode_to_uint8

Array = jax.Array

METHODS = (
    "and", "or", "avg", "and_ode", "avg_ode",
    "sd_ab", "sd_ba", "sd_ab_or", "sd_ba_or", "sd_a", "sd_b",
)


@dataclasses.dataclass
class SDPipelineConfig:
    num_inference_steps: int = 1000  # reference default (clip_eval.py:534)
    guidance_scale: float = 7.5
    height: int = 512
    width: int = 512
    temperature: float = 1.0  # OR temperature  (args.T)
    logp: float = 0.0  # OR bias (args.logp)
    lift: float = 0.0  # AND lift bias
    kappa_fixed: float = 0.5  # avg methods
    fused_kernel: Optional[bool] = None  # Pallas OR epilogue; None = auto (TPU)
    # Pass the shared latent ONCE per 3-conditioning forward so the UNet's
    # pre-cross-attention prefix runs at batch b instead of 3b (exact —
    # see SDUNet's conditioning-dedup docstring). Applies to or/and/avg*
    # and and_ode (whose discarded uncond tangent makes the jvp dedup
    # exact too); sd_* baselines evolve a distinct uncond trajectory and
    # keep the tiled forward.
    cond_dedup: bool = True


@dataclasses.dataclass
class SDModules:
    """Model bundle: UNet + text encoder + VAE decoder with their params."""

    unet: SDUNet
    unet_params: dict
    text: CLIPTextEncoder
    text_params: dict
    tokenizer: Tokenizer
    vae: VAEDecoder
    vae_params: dict
    vae_scaling: float
    grid_train_timesteps: int = 1000


def build_sd_modules(
    key: Array,
    *,
    unet_config: Optional[SDUNetConfig] = None,
    text_config: Optional[CLIPTextConfig] = None,
    vae_config: Optional[VAEConfig] = None,
    weights_dir: Optional[str] = None,
    height: int = 512,
    width: int = 512,
    dtype=jnp.bfloat16,
) -> SDModules:
    """Init the SD stack; loads converted HF weights when ``weights_dir``
    contains safetensors (see ``models/sd/convert.py``), random otherwise."""
    ucfg = unet_config or SDUNetConfig()
    tcfg = text_config or CLIPTextConfig()
    vcfg = vae_config or VAEConfig()
    unet = SDUNet(ucfg, dtype=dtype)
    text = CLIPTextEncoder(tcfg, dtype=dtype)
    vae = VAEDecoder(vcfg, dtype=dtype)
    k1, k2, k3 = jax.random.split(key, 3)
    # Param shapes are spatial-size independent: init at the smallest legal
    # spatial extent, under jit — eager init dispatches thousands of tiny ops
    # (catastrophically slow over a remote-device tunnel).
    min_hw = 8 * (2 ** max(len(ucfg.block_out_channels), len(vcfg.channel_mults)))
    lat = jnp.zeros((1, min_hw // 8, min_hw // 8, ucfg.in_channels))
    ctx = jnp.zeros((1, tcfg.max_length, ucfg.cross_attention_dim))
    unet_params = jax.jit(unet.init)(k1, lat, jnp.zeros(()), ctx)["params"]
    text_params = jax.jit(text.init)(
        k2, jnp.zeros((1, tcfg.max_length), jnp.int32)
    )["params"]
    vae_params = jax.jit(vae.init)(
        k3, jnp.zeros((1, min_hw // 8, min_hw // 8, vcfg.latent_channels))
    )["params"]
    if weights_dir:
        from ..models.sd import convert

        unet_params, text_params, vae_params = convert.load_sd_weights(
            weights_dir, unet_params, text_params, vae_params,
            clip_num_layers=tcfg.num_layers,
            unet_n_down=len(ucfg.block_out_channels),
            unet_layers_per_block=ucfg.layers_per_block,
            vae_n_levels=len(vcfg.channel_mults),
            vae_layers_per_block=vcfg.layers_per_block,
        )
    return SDModules(
        unet=unet, unet_params=unet_params,
        text=text, text_params=text_params,
        tokenizer=Tokenizer(tcfg, hf_path=weights_dir),
        vae=vae, vae_params=vae_params, vae_scaling=vcfg.scaling_factor,
    )


def encode_prompts(mod: SDModules, prompts: list[str]) -> Array:
    ids = jnp.asarray(mod.tokenizer(prompts))
    return mod.text.apply({"params": mod.text_params}, ids)


def _sum_ev(x):
    return jnp.sum(x.astype(jnp.float32), axis=tuple(range(1, x.ndim)))


def superdiff_sd_sample(
    mod: SDModules,
    unet_params,
    method: str,
    key: Array,
    ctx_obj: Array,
    ctx_bg: Array,
    ctx_unc: Array,
    cfg: SDPipelineConfig,
) -> Tuple[Array, dict]:
    """Run one composed generation; returns (final latents, per-step traces).

    ``ctx_*``: (B, 77, 768) text contexts. ``unet_params`` is passed (not
    closed over) so the jitted program takes weights as runtime inputs. The
    caller jits via ``make_sampler`` so the scan compiles once per
    (method, steps, shape).
    """
    assert method in METHODS, method
    g = cfg.guidance_scale
    n = cfg.num_inference_steps
    grid = SigmaGrid.euler_discrete(n, num_train_timesteps=mod.grid_train_timesteps)
    timesteps, sigmas = grid.as_arrays()
    b = ctx_obj.shape[0]
    latent_shape = (b, cfg.height // 8, cfg.width // 8, 4)

    def vel(x, t, sigma, ctx):
        # velocity oracle v = unet(x / sqrt(sigma^2+1), t, ctx)  (clip_eval.py:90-93)
        return mod.unet.apply({"params": unet_params}, x / jnp.sqrt(sigma**2 + 1.0), t, ctx)

    init_key, path_key = jax.random.split(key)
    x = jax.random.normal(init_key, latent_shape) * grid.init_noise_sigma
    is_sd_baseline = method.startswith("sd_")
    # SD baselines additionally evolve an unconditional trajectory for the
    # ll_uncond comparison (clip_eval.py:342,366-374).
    x_unc = x

    def batched_vels(xs, t, sigma, ctxs):
        """One UNet forward over the concatenated conditioning batch."""
        big_x = jnp.concatenate(xs, axis=0)
        big_c = jnp.concatenate(ctxs, axis=0)
        out = vel(big_x, t, sigma, big_c)
        return jnp.split(out, len(xs), axis=0)

    def batched_vels_shared(x, t, sigma, ctxs):
        """Conditioning-dedup forward: the shared latent is passed once and
        the UNet expands it where context first enters (exact, see
        SDUNet docstring)."""
        big_c = jnp.concatenate(ctxs, axis=0)
        out = vel(x, t, sigma, big_c)
        return jnp.split(out, len(ctxs), axis=0)

    def body(carry, i):
        x, x_unc, ll_obj, ll_bg, ll_unc, k = carry
        sigma = sigmas[i]
        dsigma = sigmas[i + 1] - sigmas[i]
        t = timesteps[i]
        step_key = jax.random.fold_in(path_key, i)
        zs = jax.random.normal(step_key, x.shape)
        noise = jnp.sqrt(2.0 * jnp.abs(dsigma) * sigma) * zs

        if is_sd_baseline:
            v_obj, v_unc, v_unc_only = batched_vels(
                [x, x, x_unc], t, sigma, [ctx_obj, ctx_unc, ctx_unc]
            )
            vf = v_unc + g * (v_obj - v_unc)
            dx = 2.0 * dsigma * vf + noise
            new_x = x + dx
            dx_u = 2.0 * dsigma * v_unc_only + noise
            new_x_unc = x_unc + dx_u
            dll = -jnp.abs(dsigma) / sigma * _sum_ev(v_obj**2) - _sum_ev(dx * v_obj) / sigma
            new_ll_obj = ll_obj + dll
            new_ll_bg = new_ll_obj
            new_ll_unc = ll_unc - jnp.abs(dsigma) / sigma * _sum_ev(v_unc_only**2) - _sum_ev(dx * v_unc_only) / sigma
            new_k = k
        elif method == "and_ode":
            probe = ito.rademacher(step_key, x.shape)
            big_c = jnp.concatenate([ctx_obj, ctx_bg, ctx_unc], axis=0)

            def f(big_x):
                return vel(big_x, t, sigma, big_c)

            if cfg.cond_dedup:
                # the uncond group's tangent is discarded below, so jvp
                # through the dedup forward with the shared probe returns
                # identical used values (prefix primal AND tangent dedup)
                vals, tans = jax.jvp(f, (x,), (probe,))
            else:
                big_x = jnp.concatenate([x, x, x], axis=0)
                big_tan = jnp.concatenate(
                    [probe, probe, jnp.zeros_like(probe)], axis=0
                )
                vals, tans = jax.jvp(f, (big_x,), (big_tan,))
            v_obj, v_bg, v_unc = jnp.split(vals, 3, axis=0)
            t_obj, t_bg, _ = jnp.split(tans, 3, axis=0)
            div_obj = -_sum_ev(probe * t_obj)  # reference sign (clip_eval.py:101)
            div_bg = -_sum_ev(probe * t_bg)
            new_k = kp.kappa_and_ode(
                v_obj, v_bg, div_obj, div_bg, v_unc, sigma, dsigma, g, n, cfg.lift
            )
            vf = v_unc + g * ((v_bg - v_unc) + new_k[:, None, None, None] * (v_obj - v_bg))
            dx = dsigma * vf
            new_x = x + dx
            dlls = ito.dlogq_ode_sigma_space(
                jnp.stack([v_obj, v_bg]), jnp.stack([div_obj, div_bg]), vf, sigma, dsigma
            )
            new_ll_obj = ll_obj + dlls[:, 0]
            new_ll_bg = ll_bg + dlls[:, 1]
            new_x_unc, new_ll_unc = x_unc, ll_unc
        else:  # and / or / avg / avg_ode
            if cfg.cond_dedup:
                v_obj, v_bg, v_unc = batched_vels_shared(
                    x, t, sigma, [ctx_obj, ctx_bg, ctx_unc]
                )
            else:
                v_obj, v_bg, v_unc = batched_vels(
                    [x, x, x], t, sigma, [ctx_obj, ctx_bg, ctx_unc]
                )
            use_fused = (
                cfg.fused_kernel
                if cfg.fused_kernel is not None
                else jax.default_backend() == "tpu"
            )
            if method == "or" and use_fused:
                # single-HBM-pass Pallas epilogue (ops/pallas/sd_fused_step.py)
                from ..ops.pallas.sd_fused_step import sd_or_step_pallas

                flat = lambda a: a.reshape(b, -1)
                new_x_flat, new_ll2, new_k = sd_or_step_pallas(
                    flat(v_obj), flat(v_bg), flat(v_unc), flat(x), flat(zs),
                    jnp.stack([ll_obj, ll_bg], axis=-1), sigma, dsigma,
                    temperature=cfg.temperature, logp=cfg.logp, guidance=g,
                    interpret=jax.default_backend() != "tpu",
                )
                new_carry = (
                    new_x_flat.reshape(x.shape), x_unc,
                    new_ll2[:, 0], new_ll2[:, 1], ll_unc, new_k,
                )
                trace = {"kappa": new_k, "ll_obj": new_ll2[:, 0], "ll_bg": new_ll2[:, 1]}
                return new_carry, trace
            if method == "and":
                dx_ind = 2.0 * dsigma * (v_unc + g * (v_bg - v_unc)) + noise
                new_k = kp.kappa_and_sde(v_obj, v_bg, dx_ind, sigma, dsigma, g, n, cfg.lift)
            elif method == "or":
                new_k = kp.kappa_or(ll_obj, ll_bg, cfg.temperature, cfg.logp)
            else:
                new_k = jnp.full((b,), cfg.kappa_fixed, jnp.float32)
            vf = v_unc + g * ((v_bg - v_unc) + new_k[:, None, None, None] * (v_obj - v_bg))
            if method == "avg_ode":
                dx = dsigma * vf
            else:
                dx = 2.0 * dsigma * vf + noise
            new_x = x + dx
            if method == "avg_ode":
                # Noise-free ODE step: the SDE divergence-free estimator does
                # not apply, and the reference tracks no log-likelihoods for
                # avg_ode (clip_eval.py:417-419) — carry ll unchanged.
                new_ll_obj, new_ll_bg = ll_obj, ll_bg
            else:
                vels2 = jnp.stack([v_obj, v_bg])
                if method == "or":
                    dlls = ito.dlogq_sde_sigma_space_or(vels2, dx, sigma, dsigma)
                else:
                    dlls = ito.dlogq_sde_sigma_space(vels2, dx, sigma, dsigma)
                new_ll_obj = ll_obj + dlls[:, 0]
                new_ll_bg = ll_bg + dlls[:, 1]
            new_x_unc, new_ll_unc = x_unc, ll_unc

        new_carry = (new_x, new_x_unc, new_ll_obj, new_ll_bg, new_ll_unc, new_k)
        trace = {"kappa": new_k, "ll_obj": new_ll_obj, "ll_bg": new_ll_bg}
        return new_carry, trace

    # ll arrays start at 1.0 in the reference (clip_eval.py:348-350) — an
    # additive constant that cancels in kappa; we keep it for trace parity.
    ones = jnp.ones((b,), jnp.float32)
    carry0 = (x, x_unc, ones, ones, ones, jnp.full((b,), 0.5, jnp.float32))
    (x, x_unc, ll_obj, ll_bg, ll_unc, k), traces = jax.lax.scan(
        body, carry0, jnp.arange(n), length=n
    )
    traces.update(final_ll_obj=ll_obj, final_ll_bg=ll_bg, final_ll_uncond=ll_unc)
    return x, traces


def make_sampler(mod: SDModules, method: str, cfg: SDPipelineConfig):
    """Jitted sampler closure: (key, ctx_obj, ctx_bg, ctx_unc) -> latents."""

    @jax.jit
    def run_with_params(params, key, ctx_obj, ctx_bg, ctx_unc):
        return superdiff_sd_sample(mod, params, method, key, ctx_obj, ctx_bg, ctx_unc, cfg)

    def run(key, ctx_obj, ctx_bg, ctx_unc):
        return run_with_params(mod.unet_params, key, ctx_obj, ctx_bg, ctx_unc)

    return run


def prepare_contexts(mod: SDModules, method: str, obj: str, bg: str, batch_size: int):
    """Prompt construction per method (clip_eval.py:288-322)."""
    if method == "sd_ab":
        obj_prompt = f"{obj} that looks like {bg}"
    elif method == "sd_ab_or":
        obj_prompt = f"{obj} or {bg}"
    elif method == "sd_ba":
        obj_prompt = f"{bg} that looks like {obj}"
    elif method == "sd_ba_or":
        obj_prompt = f"{bg} or {obj}"
    elif method == "sd_a":
        obj_prompt = obj
    elif method == "sd_b":
        obj_prompt = bg
    else:
        obj_prompt = obj
    ctx_obj = encode_prompts(mod, [obj_prompt] * batch_size)
    ctx_bg = encode_prompts(mod, [bg] * batch_size)
    ctx_unc = encode_prompts(mod, [""] * batch_size)
    return ctx_obj, ctx_bg, ctx_unc


def generate(
    mod: SDModules,
    method: str,
    obj: str,
    bg: str,
    *,
    seed: int = 1,
    batch_size: int = 6,
    cfg: Optional[SDPipelineConfig] = None,
    decode: bool = True,
):
    """End-to-end generation matching ``clip_eval.py run()`` defaults."""
    cfg = cfg or SDPipelineConfig()
    ctxs = prepare_contexts(mod, method, obj, bg, batch_size)
    key = jax.random.PRNGKey(seed)
    latents, traces = make_sampler(mod, method, cfg)(key, *ctxs)
    out = {"latents": latents, "traces": traces}
    if decode:
        out["images"] = np.asarray(
            decode_to_uint8(mod.vae, mod.vae_params, latents, mod.vae_scaling)
        )
    return out
