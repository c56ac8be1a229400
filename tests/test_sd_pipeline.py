"""SD composition pipeline at tiny config: methods, traces, decode."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from superdiff_tpu.models.sd.clip import CLIPTextConfig
from superdiff_tpu.models.sd.unet import SDUNetConfig
from superdiff_tpu.models.sd.vae import VAEConfig
from superdiff_tpu.pipelines import sd as sdp


@pytest.fixture(scope="module")
def mod():
    return sdp.build_sd_modules(
        jax.random.PRNGKey(0),
        unet_config=SDUNetConfig.tiny(),
        text_config=CLIPTextConfig.tiny(),
        vae_config=VAEConfig.tiny(),
        height=64, width=64,
    )


CFG = sdp.SDPipelineConfig(num_inference_steps=3, height=64, width=64)


def test_or_method_runs_and_kappa_in_unit_interval(mod):
    out = sdp.generate(mod, "or", "a cat", "a dog", seed=1, batch_size=2, cfg=CFG)
    lat = np.asarray(out["latents"])
    assert lat.shape == (2, 8, 8, 4) and np.isfinite(lat).all()
    k = np.asarray(out["traces"]["kappa"])
    assert k.shape == (3, 2)
    assert np.all((k >= 0) & (k <= 1))
    assert out["images"].dtype == np.uint8


def test_and_ode_divergence_path(mod):
    out = sdp.generate(mod, "and_ode", "a cat", "a dog", seed=1, batch_size=2, cfg=CFG)
    assert np.isfinite(np.asarray(out["latents"])).all()
    # ll traces move (divergence estimator active)
    ll = np.asarray(out["traces"]["final_ll_obj"])
    assert not np.allclose(ll, 1.0)


def test_sd_baseline_tracks_uncond_trajectory(mod):
    out = sdp.generate(mod, "sd_ab", "a cat", "a dog", seed=1, batch_size=1, cfg=CFG)
    tr = out["traces"]
    assert np.isfinite(np.asarray(tr["final_ll_uncond"])).all()


def test_prompt_construction_per_method(mod):
    ctxs = sdp.prepare_contexts(mod, "sd_ba", "a cat", "a dog", 2)
    assert all(c.shape == (2, 77, 64) for c in ctxs)


def test_nll_roundtrip_smoke(mod):
    """ode_nll runs and returns finite per-sample log-likelihoods."""
    from superdiff_tpu.core.schedules import SigmaGrid
    from superdiff_tpu.eval.nll import ode_nll

    grid = SigmaGrid.euler_discrete(3)
    ctx = jnp.zeros((2, 77, 64))

    def vel_fn(x, t, sigma, c):
        return mod.unet.apply(
            {"params": mod.unet_params}, x / jnp.sqrt(sigma**2 + 1.0), t, c
        )

    lat = 0.1 * jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, 4))
    out = jax.jit(lambda l, k: ode_nll(vel_fn, ctx, l, grid, k))(
        lat, jax.random.PRNGKey(1)
    )
    assert np.isfinite(np.asarray(out["ll"])).all()
    assert out["latents_end"].shape == lat.shape


def test_or_fused_kernel_matches_jnp_path(mod):
    """Forcing the Pallas OR epilogue (interpreted on CPU) reproduces the
    jnp path bit-close over a full trajectory."""
    import dataclasses

    outs = []
    for fused in (False, True):
        cfg = dataclasses.replace(CFG, fused_kernel=fused)
        out = sdp.generate(mod, "or", "a cat", "a dog", seed=3, batch_size=2,
                           cfg=cfg, decode=False)
        outs.append(out)
    np.testing.assert_allclose(
        np.asarray(outs[0]["latents"]), np.asarray(outs[1]["latents"]),
        rtol=1e-4, atol=1e-4,
    )
    np.testing.assert_allclose(
        np.asarray(outs[0]["traces"]["kappa"]), np.asarray(outs[1]["traces"]["kappa"]),
        rtol=1e-4, atol=1e-4,
    )


def test_cond_dedup_matches_tiled_forward(mod):
    """SDUNet conditioning dedup: x passed once for 3 contexts must equal the
    tiled batch-3b forward exactly (the prefix is shared, not approximated)."""
    x = jax.random.normal(jax.random.PRNGKey(31), (2, 8, 8, 4), jnp.float32)
    ctx = jax.random.normal(jax.random.PRNGKey(32), (6, 7, 64))
    t = jnp.asarray(3.0)
    out_dedup = mod.unet.apply({"params": mod.unet_params}, x, t, ctx)
    out_tiled = mod.unet.apply(
        {"params": mod.unet_params}, jnp.tile(x, (3, 1, 1, 1)), t, ctx
    )
    assert out_dedup.shape == out_tiled.shape == (6, 8, 8, 4)
    np.testing.assert_allclose(
        np.asarray(out_dedup), np.asarray(out_tiled), rtol=1e-5, atol=1e-5
    )


def test_cond_dedup_generate_matches_tiled(mod):
    """generate() with cond_dedup on/off. The dedup is exact math (bitwise
    eagerly — see test_cond_dedup_matches_tiled_forward), but under jit XLA
    reassociates the two graphs' bf16 arithmetic differently, so jitted
    outputs agree to bf16-rounding of the ~50-magnitude velocities per step:
    one step within a few bf16 ULPs of the max magnitude, and the kappa policy (fp32 reductions
    over the velocity field) stays tight across all steps."""
    import dataclasses

    one = dataclasses.replace(CFG, num_inference_steps=1)
    on1 = sdp.generate(mod, "or", "a cat", "a dog", seed=3, batch_size=2,
                       cfg=dataclasses.replace(one, cond_dedup=True))
    off1 = sdp.generate(mod, "or", "a cat", "a dog", seed=3, batch_size=2,
                        cfg=dataclasses.replace(one, cond_dedup=False))
    a, b = np.asarray(on1["latents"]), np.asarray(off1["latents"])
    scale = np.abs(b).max()
    np.testing.assert_allclose(a / scale, b / scale, atol=2e-2)

    on = sdp.generate(mod, "or", "a cat", "a dog", seed=3, batch_size=2,
                      cfg=dataclasses.replace(CFG, cond_dedup=True))
    off = sdp.generate(mod, "or", "a cat", "a dog", seed=3, batch_size=2,
                       cfg=dataclasses.replace(CFG, cond_dedup=False))
    np.testing.assert_allclose(
        np.asarray(on["traces"]["kappa"]), np.asarray(off["traces"]["kappa"]),
        rtol=0, atol=1e-3,
    )

    # and_ode: the jvp dedup (uncond tangent discarded) — same one-step bound
    on_a = sdp.generate(mod, "and_ode", "a cat", "a dog", seed=3, batch_size=1,
                        cfg=dataclasses.replace(one, cond_dedup=True))
    off_a = sdp.generate(mod, "and_ode", "a cat", "a dog", seed=3, batch_size=1,
                         cfg=dataclasses.replace(one, cond_dedup=False))
    a, b = np.asarray(on_a["latents"]), np.asarray(off_a["latents"])
    scale = np.abs(b).max()
    np.testing.assert_allclose(a / scale, b / scale, atol=2e-2)
