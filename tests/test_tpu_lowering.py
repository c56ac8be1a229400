"""Every Pallas kernel must LOWER for TPU, not just run in interpret mode.

Interpret mode executes the kernel body as plain jnp on CPU, so a primitive
with no Mosaic lowering (e.g. ``lax.erfc_p``, which ``jax.nn.gelu(
approximate=False)`` uses) passes the whole CPU suite and then fails to
compile on the chip — exactly how the exact-erf GEGLU change broke the
round-4 measurement queue. ``jax.jit(f).trace(...).lower(
lowering_platforms=("tpu",))`` runs the full Mosaic lowering pipeline on a
CPU-only host (the kernel is serialized into the module at lowering time),
so this file guards the compiled path from the CPU suite at the real SD /
composition shapes.

Reference protocol shapes: ``applications/images/clip_eval.py:329-443``
(batch-3B 512 px forward) and ``cifar/dynamics.py:100-137`` (joint SDE step).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from superdiff_tpu.ops.pallas.flash_attention import flash_mha
from superdiff_tpu.ops.pallas.fused_step import fused_sde_step_pallas
from superdiff_tpu.ops.pallas.geglu_ffn import geglu_ffn, geglu_ffn_block
from superdiff_tpu.ops.pallas.sd_fused_step import sd_or_step_pallas


def _assert_tpu_lowerable(fn, *args):
    text = jax.jit(fn).trace(*args).lower(lowering_platforms=("tpu",)).as_text()
    assert "tpu_custom_call" in text, "expected a Pallas kernel in the module"


@pytest.mark.parametrize("approximate", [True, False])
def test_geglu_ffn_block_lowers_for_tpu(approximate):
    c, f, m = 320, 1280, 1024  # SD L1 transformer FFN tile
    x = jnp.zeros((m, c), jnp.bfloat16)
    gamma = jnp.ones((c,), jnp.float32)
    beta = jnp.zeros((c,), jnp.float32)
    w1 = jnp.zeros((c, 2 * f), jnp.bfloat16)
    b1 = jnp.zeros((2 * f,), jnp.float32)
    w2 = jnp.zeros((f, c), jnp.bfloat16)
    b2 = jnp.zeros((c,), jnp.float32)
    _assert_tpu_lowerable(
        functools.partial(
            geglu_ffn_block, gamma=gamma, beta=beta, w1=w1, b1=b1, w2=w2,
            b2=b2, approximate=approximate, interpret=False,
        ),
        x,
    )


@pytest.mark.parametrize("approximate", [True, False])
def test_geglu_ffn_lowers_for_tpu(approximate):
    c, f, m = 320, 1280, 512
    x = jnp.zeros((m, c), jnp.bfloat16)
    w1 = jnp.zeros((c, 2 * f), jnp.bfloat16)
    b1 = jnp.zeros((2 * f,), jnp.float32)
    w2 = jnp.zeros((f, c), jnp.bfloat16)
    b2 = jnp.zeros((c,), jnp.float32)
    _assert_tpu_lowerable(
        functools.partial(
            geglu_ffn, w1=w1, b1=b1, w2=w2, b2=b2,
            approximate=approximate, interpret=False,
        ),
        x,
    )


@pytest.mark.parametrize(
    "lk,native_long_kv",
    [
        (1024, False),  # single-pass per-head kernel
        (4096, False),  # online-softmax flash loop
        (4096, True),   # transpose-free packed long-kv kernel (flash_nat)
    ],
)
def test_flash_mha_lowers_for_tpu(lk, native_long_kv):
    b, lq, h, d = 2, 4096, 8, 40  # SD L1 self/cross attention
    q = jnp.zeros((b, lq, h, d), jnp.bfloat16)
    k = jnp.zeros((b, lk, h, d), jnp.bfloat16)
    v = jnp.zeros((b, lk, h, d), jnp.bfloat16)
    _assert_tpu_lowerable(
        functools.partial(
            flash_mha, interpret=False, native_long_kv=native_long_kv
        ),
        q, k, v,
    )


def test_flash_mha_short_kv_routes_to_einsum():
    """kv <= 256 routes to plain XLA einsum by default (the measured
    winner, BENCH_DETAIL attn_cross_routing_sweep) — the module must
    lower for TPU with NO Pallas custom call."""
    b, lq, h, d = 2, 4096, 8, 40
    q = jnp.zeros((b, lq, h, d), jnp.bfloat16)
    k = jnp.zeros((b, 77, h, d), jnp.bfloat16)
    text = (
        jax.jit(functools.partial(flash_mha, interpret=False))
        .trace(q, k, k).lower(lowering_platforms=("tpu",)).as_text()
    )
    assert "tpu_custom_call" not in text


@pytest.mark.parametrize("impl", ["nat", "xpk"])
def test_flash_cross_levers_lower_for_tpu(impl):
    """The short-kv Pallas levers (swept by scripts/bench_attn_cross.py)
    must stay lowerable — 'xpk' builds block-diagonal operands and does
    128-aligned per-head lane slices inside the kernel."""
    import superdiff_tpu.ops.pallas.flash_attention as fa

    b, lq, h, d = 2, 4096, 8, 40
    q = jnp.zeros((b, lq, h, d), jnp.bfloat16)
    k = jnp.zeros((b, 77, h, d), jnp.bfloat16)
    prev = fa._CROSS_IMPL
    try:
        fa._CROSS_IMPL = impl
        _assert_tpu_lowerable(
            functools.partial(flash_mha, interpret=False), q, k, k
        )
    finally:
        fa._CROSS_IMPL = prev


@pytest.mark.parametrize("lk,impl", [(4096, "pvtd1"), (4096, "pvtd2"),
                                     (1024, "pvtd1")])
def test_flash_mha_eod_lowers_for_tpu(lk, impl):
    """The d-major entry (q/v/o in (B,H,D,L)) at both long tiers."""
    import superdiff_tpu.ops.pallas.flash_attention as fa
    from superdiff_tpu.ops.pallas.flash_attention import flash_mha_eod

    b, h, d = 2, 8, 40
    qt = jnp.zeros((b, h, d, 4096), jnp.bfloat16)
    k = jnp.zeros((b, h, lk, d), jnp.bfloat16)
    vt = jnp.zeros((b, h, d, lk), jnp.bfloat16)
    prev = (fa._EOD_IMPL, fa._EOD_IMPL_MID)
    try:
        fa._EOD_IMPL = fa._EOD_IMPL_MID = impl
        _assert_tpu_lowerable(
            functools.partial(flash_mha_eod, interpret=False), qt, k, vt
        )
    finally:
        fa._EOD_IMPL, fa._EOD_IMPL_MID = prev


@pytest.mark.parametrize("impl", ["mxsum", "pipe2", "pvt2"])
def test_flash_long_kernel_variants_lower_for_tpu(impl):
    """The single-kv-block variants build a (lk, d+1) ones-extended V via a
    lane-dim pad INSIDE the kernel — a lowering-risk op Mosaic must accept
    at the real SD L0 shape. 'pvt2' additionally pads on sublanes and ends
    with an in-kernel (d, step) -> (step, d) fp32 transpose."""
    import superdiff_tpu.ops.pallas.flash_attention as fa

    b, lq, h, d = 2, 4096, 8, 40
    q = jnp.zeros((b, lq, h, d), jnp.bfloat16)
    prev = fa._LONG_IMPL
    try:
        fa._LONG_IMPL = impl
        _assert_tpu_lowerable(
            functools.partial(flash_mha, interpret=False), q, q, q
        )
    finally:
        fa._LONG_IMPL = prev


def test_flash_mha_bhld_lowers_for_tpu():
    from superdiff_tpu.ops.pallas.flash_attention import flash_mha_bhld

    b, l, h, d = 2, 4096, 8, 40  # SD L1 self-attention, kernel layout
    q = jnp.zeros((b, h, l, d), jnp.bfloat16)
    _assert_tpu_lowerable(
        functools.partial(flash_mha_bhld, interpret=False), q, q, q
    )


def test_fused_sde_step_lowers_for_tpu():
    n, b, d = 2, 64, 3072  # CIFAR joint SDE step
    sscores = jnp.zeros((n, b, d), jnp.float32)
    x = jnp.zeros((b, d), jnp.float32)
    eps = jnp.zeros((b, d), jnp.float32)
    logq = jnp.zeros((b, n), jnp.float32)
    s = jnp.float32(0.5)
    _assert_tpu_lowerable(
        lambda *a: fused_sde_step_pallas(*a, s, s, s, s, interpret=False),
        sscores, x, eps, logq,
    )


def test_sd_or_step_lowers_for_tpu():
    b, d = 8, 4 * 64 * 64  # SD latent step
    lat = jnp.zeros((b, d), jnp.float32)
    ll = jnp.zeros((b, 2), jnp.float32)
    s = jnp.float32(1.0)
    _assert_tpu_lowerable(
        lambda vo, vb, vu, x, e, l: sd_or_step_pallas(
            vo, vb, vu, x, e, l, s, s, interpret=False
        ),
        lat, lat, lat, lat, lat, ll,
    )


def test_gelu_poly_matches_true_gelu():
    """The in-kernel FMA-only exact-gelu polynomial (Mosaic has no erf/erfc
    lowering; the A&S rational-exp erf it replaces cost a measured
    +3.55 ms/forward) must stay within ~2e-6 of jax.nn.gelu's exact branch
    across and beyond the clamp range — an order below the 2e-5
    kernel-vs-einsum tolerance and the bf16 output grid."""
    from superdiff_tpu.ops.pallas.geglu_ffn import _gelu_kernel

    x = jnp.linspace(-10.0, 10.0, 400001, dtype=jnp.float32)
    g_err = jnp.abs(
        _gelu_kernel(x, approximate=False)
        - jax.nn.gelu(x, approximate=False)
    )
    assert float(g_err.max()) < 2e-6


def test_geglu_ffn_exact_gelu_multitile_grid():
    """approximate=False through the REAL kernel body (multi-tile grid) in
    interpret mode — the original exact-gelu test only hit the tiny-shape
    einsum fallback, which is how the erfc lowering gap slipped through."""
    from superdiff_tpu.ops.pallas.geglu_ffn import _reference, geglu_ffn

    m, c, f = 512, 128, 512
    ks = jax.random.split(jax.random.PRNGKey(11), 5)
    x = jax.random.normal(ks[0], (m, c), jnp.float32)
    w1 = jax.random.normal(ks[1], (c, 2 * f), jnp.float32) / np.sqrt(c)
    b1 = jax.random.normal(ks[2], (2 * f,), jnp.float32)
    w2 = jax.random.normal(ks[3], (f, c), jnp.float32) / np.sqrt(f)
    b2 = jax.random.normal(ks[4], (c,), jnp.float32)
    out = geglu_ffn(x, w1, b1, w2, b2, approximate=False, interpret=True)
    ref = _reference(x, w1, b1, w2, b2, False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)
