"""ScoreUNet shape/grad/jvp sanity on tiny configs."""

import jax
import jax.numpy as jnp
import numpy as np

from superdiff_tpu.models import ScoreUNet

TINY = dict(nf=16, ch_mult=(1, 2), num_res_blocks=1, attn_resolutions=(4,))


def _init(num_classes=None):
    model = ScoreUNet(num_classes=num_classes, **TINY)
    x = jnp.zeros((2, 8, 8, 3))
    t = jnp.ones((2, 1, 1, 1))
    y = jnp.zeros((2,), jnp.int32) if num_classes else None
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        t, x, y, train=True,
    )
    return model, variables["params"]


def test_unet_shapes_and_zero_init():
    model, params = _init()
    x = jax.random.normal(jax.random.PRNGKey(2), (2, 8, 8, 3))
    t = 0.5 * jnp.ones((2, 1, 1, 1))
    out = model.apply({"params": params}, t, x, None, train=False)
    assert out.shape == x.shape
    # zero-init output conv: untrained net outputs exactly zero
    np.testing.assert_allclose(np.asarray(out), 0.0, atol=1e-6)


def test_unet_conditioned_and_jvp():
    """jax.jvp flows through attention natively (ODE estimator requirement)."""
    model, params = _init(num_classes=10)
    x = jax.random.normal(jax.random.PRNGKey(2), (2, 8, 8, 3))
    t = 0.5 * jnp.ones((2, 1, 1, 1))
    y = jnp.asarray([1, 7])

    def fn(_x):
        return model.apply({"params": params}, t, _x, y, train=False)

    probe = jnp.sign(jax.random.normal(jax.random.PRNGKey(3), x.shape))
    val, tangent = jax.jvp(fn, (x,), (probe,))
    assert val.shape == x.shape and tangent.shape == x.shape
    assert np.all(np.isfinite(np.asarray(tangent)))


def test_unet_grad_nonzero_after_step():
    model, params = _init()
    x = jax.random.normal(jax.random.PRNGKey(2), (4, 8, 8, 3))
    t = 0.5 * jnp.ones((4, 1, 1, 1))
    eps = jax.random.normal(jax.random.PRNGKey(3), x.shape)

    def loss(p):
        pred = model.apply({"params": p}, t, x, None, train=False)
        return jnp.mean((eps + pred) ** 2)

    g = jax.grad(loss)(params)
    total = sum(float(jnp.sum(jnp.abs(l))) for l in jax.tree.leaves(g))
    assert total > 0.0


def test_groupnorm32_matches_flax_groupnorm():
    """Folded scale/shift application must match nn.GroupNorm(f32) in both
    dtypes (fp32 exact; bf16 to one ulp)."""
    import flax.linen as nn

    from superdiff_tpu.models.unet import GroupNorm32

    key = jax.random.PRNGKey(0)
    for dt, tol in ((jnp.float32, 1e-5), (jnp.bfloat16, 0.05)):
        x = jax.random.normal(key, (2, 8, 8, 64), dt) * 3 + 1
        gn = GroupNorm32()
        p = gn.init(key, x)["params"]
        # perturb affine params so the test exercises them
        p = jax.tree.map(lambda a: a + 0.3, p)
        ref = nn.GroupNorm(num_groups=32, dtype=jnp.float32)
        pr = {"scale": p["GroupNorm_0"]["scale"], "bias": p["GroupNorm_0"]["bias"]}
        y1 = gn.apply({"params": p}, x).astype(jnp.float32)
        y2 = ref.apply({"params": pr}, x.astype(jnp.float32))
        np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), rtol=tol, atol=tol)


def test_groupnorm32_finite_on_large_mean_tiny_spread():
    """Fast-variance cancellation regression: a group with huge mean and
    near-zero spread makes E[x^2]-E[x]^2 negative in fp32; without the
    flax-style clamp, rsqrt returns NaN (surfaced as a jit-only NaN in the
    SD sd_* samplers at certain step counts)."""
    from superdiff_tpu.models.unet import GroupNorm32

    x = 300.0 + 1e-3 * jax.random.normal(jax.random.PRNGKey(1), (1, 4, 4, 64))
    gn = GroupNorm32()
    p = gn.init(jax.random.PRNGKey(0), x)["params"]
    for f in (gn.apply, jax.jit(gn.apply)):
        y = f({"params": p}, x)
        assert bool(jnp.isfinite(y).all())
