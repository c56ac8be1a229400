"""Golden short-trajectory regression tests (SURVEY.md §4b).

RFdiffusion-style determinism tests (``applications/proteins/RFdiffusion/
tests/test_diffusion.py:65-85`` runs 2-step trajectories against stored
reference outputs): fixed PRNG, a handful of integration steps at tiny
model configs, full output arrays compared to committed ``.npz`` goldens.
The outputs "do not look like" real samples — determinism is what makes
them comparable, and any unintended change to schedules, estimators, kappa
policies, RNG consumption order, or integrator semantics trips them.

Goldens are generated on the 8-device virtual CPU mesh (the platform the
tests force, ``tests/conftest.py``). Regenerate after a *deliberate*
math/RNG change with:

    python tests/test_golden_trajectories.py --regen
"""

import os
import sys

if __name__ == "__main__":  # regen mode runs outside pytest/conftest
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()

import jax

if __name__ == "__main__":
    # The env var alone loses to the pinned axon TPU plugin (CLAUDE.md);
    # without this the goldens silently regenerate with TPU rounding and
    # the CPU-forced pytest runs then fail at 1e-3.
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np
import pytest

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")

RTOL = 1e-4
ATOL = 1e-4


# -- trajectory constructors (shared by tests and --regen) -------------------


def cifar_trajectories():
    from superdiff_tpu.pipelines import cifar as C

    cfg = C.CifarConfig(
        nf=16, ch_mult=(1, 2), num_res_blocks=1, attn_resolutions=(8,),
        batch_size=16, eval_batch_size=4, n_sample_steps=4,
        compute_dtype="float32", image_size=16,
    )
    model = cfg.model()
    x = jnp.zeros((1, 16, 16, 3))
    t = jnp.ones((1, 1, 1, 1))
    k = jax.random.PRNGKey(0)
    p1 = model.init({"params": k, "dropout": k}, t, x, None, train=False)["params"]
    p2 = model.init(
        {"params": jax.random.PRNGKey(1), "dropout": k}, t, x, None, train=False
    )["params"]
    out = {}
    for mode, op in (("sde", "or"), ("ode", "avg")):
        gen, _ = C.make_generator(model, [p1, p2], cfg, mode=mode, operator=op)
        x0, logq = gen(jax.random.PRNGKey(42))
        out[f"cifar_{mode}_{op}_x0"] = np.asarray(x0, np.float32)
        out[f"cifar_{mode}_{op}_logq"] = np.asarray(logq, np.float32)
    return out


def sd_trajectories():
    from superdiff_tpu.models.sd.clip import CLIPTextConfig
    from superdiff_tpu.models.sd.unet import SDUNetConfig
    from superdiff_tpu.models.sd.vae import VAEConfig
    from superdiff_tpu.pipelines import sd as sdp

    import dataclasses

    # Pinned to the pure-XLA lowering (einsum attention/FFN, repeat
    # upsampler): the golden guards the sampler/UNet *math and RNG
    # semantics*, so it must not move when a Pallas kernel micro-changes
    # (it was regenerated twice in round 3 for exactly that reason —
    # ADVICE r3 #4). The production kernels ('flash_eo', 'fused',
    # 'subpixel', pipe/long-impl variants) are each bridged to this
    # lowering by the equivalence tests in tests/test_pallas.py, including
    # the all-levers-combined full-UNet test.
    mod = sdp.build_sd_modules(
        jax.random.PRNGKey(0),
        unet_config=dataclasses.replace(
            SDUNetConfig.tiny(), attn_impl="einsum", ffn_impl="einsum",
            upsample_impl="repeat",
        ),
        text_config=CLIPTextConfig.tiny(),
        vae_config=VAEConfig.tiny(),
        height=64, width=64,
    )
    # cond_dedup pinned OFF: the golden guards the tiled-forward math/RNG
    # semantics it was recorded with. The dedup graph is exact per forward
    # (bitwise eager; XLA-rounding-level under jit) and is bridged to this
    # one by tests/test_sd_pipeline.py::test_cond_dedup_*.
    cfg = sdp.SDPipelineConfig(
        num_inference_steps=3, height=64, width=64, cond_dedup=False
    )
    out = {}
    for method, bs in (("or", 2), ("and_ode", 1), ("sd_ab", 1)):
        r = sdp.generate(mod, method, "a cat", "a dog", seed=7, batch_size=bs, cfg=cfg)
        out[f"sd_{method}_latents"] = np.asarray(r["latents"], np.float32)
        if "kappa" in r["traces"]:
            out[f"sd_{method}_kappa"] = np.asarray(r["traces"]["kappa"], np.float32)
    return out


def protein_trajectories():
    from superdiff_tpu.models.protein import (
        R3Diffuser,
        SE3Diffuser,
        SO3Diffuser,
        rigid,
    )
    from superdiff_tpu.models.protein.ipa import IPAConfig, IPAScoreNetwork
    from superdiff_tpu.pipelines.protein import CompositionConfig, compose

    se3 = SE3Diffuser(
        r3=R3Diffuser(), so3=SO3Diffuser(num_sigma=100, num_omega=200, L=200)
    )
    n = 12
    feats0 = {
        "rigids_t": rigid.rigid_identity((1, n)),
        "res_mask": jnp.ones((1, n)),
        "fixed_mask": jnp.zeros((1, n)),
        "t": jnp.ones((1,)),
        "seq_idx": jnp.broadcast_to(jnp.arange(n)[None], (1, n)),
        "sc_ca_t": jnp.zeros((1, n, 3)),
    }
    net_a = IPAScoreNetwork(IPAConfig.tiny(), se3)
    net_b = IPAScoreNetwork(IPAConfig.tiny(), se3)
    pa = net_a.init(jax.random.PRNGKey(0), feats0)["params"]
    pb = net_b.init(jax.random.PRNGKey(7), feats0)["params"]
    model_a = lambda feats, t: net_a.apply({"params": pa}, feats)
    model_b = lambda feats, t: net_b.apply({"params": pb}, feats)
    out = {}
    for op in ("OR", "AND"):
        cfg = CompositionConfig(num_t=5, kappa_operator=op)
        r = compose(jax.random.PRNGKey(3), model_a, model_b, se3, n_res=n, cfg=cfg)
        out[f"protein_{op}_rigids"] = np.asarray(r["rigids"], np.float32)
        out[f"protein_{op}_kappa_trans"] = np.asarray(
            r["traces"]["kappa_trans"], np.float32
        )
        out[f"protein_{op}_kappa_rots"] = np.asarray(
            r["traces"]["kappa_rots"], np.float32
        )
    return out


_BUILDERS = {
    "cifar": cifar_trajectories,
    "sd": sd_trajectories,
    "protein": protein_trajectories,
}


def _golden_path(name):
    return os.path.join(GOLDEN_DIR, f"{name}.npz")


@pytest.mark.parametrize("name", sorted(_BUILDERS))
def test_golden_trajectory(name):
    path = _golden_path(name)
    assert os.path.exists(path), (
        f"missing golden {path}; run `python tests/test_golden_trajectories.py --regen`"
    )
    golden = np.load(path)
    got = _BUILDERS[name]()
    assert set(got) == set(golden.files)
    for k in sorted(got):
        np.testing.assert_allclose(
            got[k], golden[k], rtol=RTOL, atol=ATOL,
            err_msg=f"golden trajectory drifted: {name}/{k}",
        )


if __name__ == "__main__":
    if "--regen" not in sys.argv:
        print(__doc__)
        sys.exit(1)
    os.makedirs(GOLDEN_DIR, exist_ok=True)
    for name, fn in _BUILDERS.items():
        arrays = fn()
        np.savez_compressed(_golden_path(name), **arrays)
        sizes = {k: v.shape for k, v in arrays.items()}
        print(f"wrote {name}: {sizes}")
