"""Tensor-parallel SD UNet inference (parallel/tp.py): the sharded forward
must match the replicated forward, and the sharding rules must hit the
transformer kernels.

Runs on the 8-device virtual CPU mesh (conftest).
"""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from superdiff_tpu.models.sd.unet import SDUNet, SDUNetConfig
from superdiff_tpu.parallel import make_tp_mesh, place_tp, sd_tp_shardings


def _tiny_unet():
    cfg = SDUNetConfig.tiny()
    # multi-chip TP uses the XLA lowering (Pallas custom calls are
    # single-chip programs; see parallel/tp.py docstring)
    cfg = type(cfg)(**{
        **cfg.__dict__, "attn_impl": "einsum", "ffn_impl": "einsum",
    })
    unet = SDUNet(cfg, dtype=jnp.float32)
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (2, 16, 16, 4), jnp.float32)
    ctx = jax.random.normal(jax.random.PRNGKey(1), (2, 7, 64), jnp.float32)
    params = unet.init(key, x[:1, :8, :8], jnp.zeros(()), ctx[:1])["params"]
    return unet, params, x, ctx


def test_tp_rules_hit_transformer_kernels():
    unet, params, _, _ = _tiny_unet()
    mesh = make_tp_mesh(data=2, tp=4)
    shardings = sd_tp_shardings(params, mesh)
    flat = jax.tree_util.tree_flatten_with_path(shardings)[0]
    sharded = {
        "/".join(getattr(k, "key", str(k)) for k in kp)
        for kp, s in flat if s.spec != P()
    }
    # every attention projection and FFN kernel of every block is sharded
    assert any("attn1/to_q/kernel" in p for p in sharded)
    assert any("to_out/kernel" in p for p in sharded)
    assert any("ff_geglu/proj/kernel" in p for p in sharded)
    assert any("ff_out/kernel" in p for p in sharded)
    assert any("proj_in/kernel" in p for p in sharded)
    # conv kernels stay replicated
    assert not any("conv" in p for p in sharded)


def test_tp_forward_matches_replicated():
    unet, params, x, ctx = _tiny_unet()
    ref = unet.apply({"params": params}, x, jnp.float32(500.0), ctx)

    mesh = make_tp_mesh(data=2, tp=4)
    params_tp = place_tp(params, mesh)
    data_in = NamedSharding(mesh, P("data"))
    x_tp = jax.device_put(x, data_in)
    ctx_tp = jax.device_put(ctx, data_in)

    @jax.jit
    def fwd(p, xx, cc):
        return unet.apply({"params": p}, xx, jnp.float32(500.0), cc)

    out = fwd(params_tp, x_tp, ctx_tp)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)
    # the output inherits a data-sharded layout (no silent full gather)
    assert isinstance(out.sharding, NamedSharding)


def test_tp_indivisible_dim_falls_back_to_replication():
    """tp=8 with 4 heads of 16 dims: qkv kernels (64, 64) still divide, but
    a deliberately odd kernel must not be sharded."""
    mesh = make_tp_mesh(data=1, tp=8)
    params = {"block_0": {"attn1": {"to_q": {"kernel": jnp.zeros((64, 60))}}}}
    sh = sd_tp_shardings(params, mesh)
    assert sh["block_0"]["attn1"]["to_q"]["kernel"].spec == P()


def test_tp_full_composition_sampler_matches_replicated():
    """TP-sharded UNet params through the full OR-composition scan
    (pipelines/sd.make_sampler) must reproduce the replicated sampler's
    latents — the multi-chip inference path end-to-end, not one forward."""
    from superdiff_tpu.models.sd.clip import CLIPTextConfig
    from superdiff_tpu.models.sd.vae import VAEConfig
    from superdiff_tpu.pipelines import sd as sdp

    base = SDUNetConfig.tiny()
    ucfg = type(base)(**{
        **base.__dict__, "attn_impl": "einsum", "ffn_impl": "einsum",
    })
    # fp32: at bf16 the TP reduction reorder (~1e-2 per forward) is
    # chaos-amplified by the 3-step trajectory into O(1) latent drift —
    # same phenomenon as the and_ode golden; fp32 keeps the reorder at
    # float-epsilon so the equality assertion is meaningful.
    mod = sdp.build_sd_modules(
        jax.random.PRNGKey(0), unet_config=ucfg,
        text_config=CLIPTextConfig.tiny(), vae_config=VAEConfig.tiny(),
        height=64, width=64, dtype=jnp.float32,
    )
    cfg = sdp.SDPipelineConfig(num_inference_steps=3, height=64, width=64)
    key = jax.random.PRNGKey(5)
    ctx = jax.random.normal(jax.random.PRNGKey(6), (2, 77, 64), jnp.float32)

    run = sdp.make_sampler(mod, "or", cfg)
    ref_lat, ref_traces = run(key, ctx, ctx, ctx)

    mesh = make_tp_mesh(data=2, tp=4)
    mod.unet_params = place_tp(mod.unet_params, mesh)
    lat, traces = run(key, ctx, ctx, ctx)
    np.testing.assert_allclose(np.asarray(lat), np.asarray(ref_lat),
                               rtol=5e-4, atol=5e-4)
    np.testing.assert_allclose(
        np.asarray(traces["kappa"]), np.asarray(ref_traces["kappa"]),
        rtol=5e-4, atol=5e-4,
    )


def test_tp_collective_counts():
    """Pin the GSPMD-inserted collectives of the TP forward (the perf
    contract stated in parallel/tp.py): per transformer block exactly
    4 all-reduces (row-parallel to_out x2, ff_out, proj_out) and
    3 all-gathers (the channel-sharded pre-LN stream gathered before
    attn1/attn2/ffn), zero collective-permutes. The packed qkv / packed
    (value|gate) GEGLU layouts this repo used before round 4 cost 240
    collective-permutes + a full FFN-hidden all-gather on the same model;
    a regression here means a layout change broke GSPMD propagation."""
    import re
    from collections import Counter

    unet, params, x, ctx = _tiny_unet()
    mesh = make_tp_mesh(data=2, tp=4)
    params_tp = place_tp(params, mesh)
    data_in = NamedSharding(mesh, P("data"))

    fwd = jax.jit(lambda p, xx, cc: unet.apply(
        {"params": p}, xx, jnp.float32(500.0), cc))
    hlo = fwd.lower(
        params_tp, jax.device_put(x, data_in), jax.device_put(ctx, data_in)
    ).compile().as_text()
    cnt = Counter()
    for line in hlo.splitlines():
        m = re.search(
            r"= (?:\S+ )?(all-reduce|all-gather|reduce-scatter"
            r"|collective-permute|all-to-all)(?:-start)?\(", line)
        if m:
            cnt[m.group(1)] += 1
    n_blocks = 16  # tiny topology: 6 down + 1 mid + 9 up spatial transformers
    assert cnt["all-reduce"] == 4 * n_blocks, cnt
    assert cnt["all-gather"] == 3 * n_blocks, cnt
    assert cnt["collective-permute"] == 0, cnt
    assert cnt["all-to-all"] == 0, cnt


def test_ensemble_tp_3axis_matches_per_model_forwards():
    """Full 3-axis composition (data x model x tp): two differently-init
    tiny SD UNets stacked on a leading model axis, kernels tp-sharded one
    dim right, the stack over 'model' — the vmapped forward must equal the
    two replicated per-model forwards."""
    from superdiff_tpu.models import stack_params
    from superdiff_tpu.parallel import (
        make_ensemble_tp_mesh,
        sd_tp_shardings_stacked,
    )

    unet, params_a, x, ctx = _tiny_unet()
    params_b = unet.init(
        jax.random.PRNGKey(7), x[:1, :8, :8], jnp.zeros(()), ctx[:1]
    )["params"]
    refs = [
        unet.apply({"params": p}, x, jnp.float32(500.0), ctx)
        for p in (params_a, params_b)
    ]

    mesh = make_ensemble_tp_mesh(data=2, model=2, tp=2)
    stacked = stack_params([params_a, params_b])
    sh = sd_tp_shardings_stacked(stacked, mesh)
    # the stacked qkv kernel rides both axes: (model, C, C') -> P('model', None, 'tp')
    flat = jax.tree_util.tree_flatten_with_path(sh)[0]
    specs = {
        "/".join(getattr(k, "key", str(k)) for k in kp): s.spec
        for kp, s in flat
    }
    qkv = [s for p, s in specs.items() if "attn1/to_q/kernel" in p]
    assert qkv and all(s == P("model", None, "tp") for s in qkv), qkv
    assert all(s[0] == "model" for s in specs.values())

    stacked = jax.tree.map(jax.device_put, stacked, sh)
    din = NamedSharding(mesh, P("data"))
    x_s, ctx_s = jax.device_put(x, din), jax.device_put(ctx, din)

    @jax.jit
    def fwd(ps, xx, cc):
        return jax.vmap(
            lambda p: unet.apply({"params": p}, xx, jnp.float32(500.0), cc)
        )(ps)

    out = fwd(stacked, x_s, ctx_s)
    assert out.shape == (2, *refs[0].shape)
    for i in range(2):
        np.testing.assert_allclose(
            np.asarray(out[i]), np.asarray(refs[i]), rtol=2e-4, atol=2e-4,
            err_msg=f"model {i} diverged under 3-axis sharding",
        )


def test_vmapped_1x1_conv_gspmd_workaround():
    """Documents the XLA GSPMD miscompilation that forced SDUNet's
    conv_shortcut to the einsum form (_Conv1x1): a vmapped 1x1
    conv_general_dilated with BOTH operands sharded over the vmapped mesh
    axis returns wrong values (O(10) error on the CPU partitioner), while
    the equivalent dot partitions correctly. If the conv form ever starts
    passing here, the workaround can be retired."""
    from jax.sharding import Mesh

    devs = np.asarray(jax.devices()[:2]).reshape(2)
    mesh = Mesh(devs, ("model",))
    ms = NamedSharding(mesh, P("model"))
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (2, 2, 8, 8, 32), jnp.float32)
    w = jax.random.normal(jax.random.PRNGKey(2), (2, 1, 1, 32, 64), jnp.float32)

    def conv(xx, kk):
        return jax.lax.conv_general_dilated(
            xx, kk, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
        )

    def dot(xx, kk):
        return jnp.einsum("bhwc,cf->bhwf", xx, kk[0, 0])

    ref = jnp.stack([conv(x[i], w[i]) for i in range(2)])
    x_s, w_s = jax.device_put(x, ms), jax.device_put(w, ms)
    out_dot = jax.jit(lambda xs, ws: jax.vmap(dot)(xs, ws))(x_s, w_s)
    np.testing.assert_allclose(np.asarray(out_dot), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
    out_conv = jax.jit(lambda xs, ws: jax.vmap(conv)(xs, ws))(x_s, w_s)
    conv_err = float(np.abs(np.asarray(out_conv) - np.asarray(ref)).max())
    if conv_err < 1e-4:
        import warnings

        warnings.warn(
            "vmapped+sharded 1x1 conv now partitions correctly "
            f"(err {conv_err:.1e}) — the _Conv1x1 einsum workaround in "
            "models/sd/unet.py can be retired"
        )
