"""Coverage for auxiliary subsystems: prefetcher, retry, CLI, traces, modes."""

import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from superdiff_tpu.core import SuperposeConfig, VPSchedule, superpose
from superdiff_tpu.data.datasets import PrefetchIterator
from superdiff_tpu.eval.self_consistency import run_subprocess_with_retry


def test_prefetch_iterator_preserves_order_and_stops():
    it = PrefetchIterator(iter(range(10)), depth=3)
    assert list(it) == list(range(10))


def test_subprocess_retry_succeeds_and_bounds():
    n = run_subprocess_with_retry([sys.executable, "-c", "pass"], max_retries=3, log=lambda m: None)
    assert n == 1
    with pytest.raises(RuntimeError, match="after 2 retries"):
        run_subprocess_with_retry(
            [sys.executable, "-c", "import sys; sys.exit(1)"], max_retries=2, log=lambda m: None
        )


def test_cli_parsers_cover_reference_surfaces():
    from superdiff_tpu.cli import build_parser

    p = build_parser()
    a = p.parse_args(["cifar", "--mode", "eval_joint_fid", "--chkpts", "a,b", "--stoch"])
    assert a.chkpts == "a,b" and a.stoch
    a = p.parse_args(["sd", "--method", "and_ode", "--T", "2.5", "--logp", "-1", "--lift", "0.3"])
    assert (a.T, a.logp, a.lift) == (2.5, -1.0, 0.3)
    a = p.parse_args(["protein", "--operator", "AND", "--lengths", "100,150", "--num_seeds", "3"])
    assert a.lengths == "100,150"
    with pytest.raises(SystemExit):
        p.parse_args(["sd", "--method", "bogus"])


def _gaussian_oracle(mus, std=0.25):
    sched = VPSchedule()
    mus = jnp.asarray(mus)

    def score_fn(t, x):
        a, sig = sched.alpha(t), sched.sigma(t)
        var = a**2 * std**2 + sig**2
        return -sig * (x[None] - a * mus[:, None, :]) / var

    return score_fn


def test_superpose_fused_flag_matches_xla_path():
    """fused_kernel=True falls back to identical math off-TPU."""
    score_fn = _gaussian_oracle([[2.0, 2.0], [-2.0, -2.0]])
    sched = VPSchedule()
    x1 = jax.random.normal(jax.random.PRNGKey(0), (32, 2))
    outs = []
    for fused in (False, True):
        cfg = SuperposeConfig(n_steps=50, mode="sde", operator="or", fused_kernel=fused)
        x0, logq, _ = jax.jit(
            lambda k, x, c=cfg: superpose(k, x, score_fn, sched, c, n_models=2)
        )(jax.random.PRNGKey(1), x1)
        outs.append((np.asarray(x0), np.asarray(logq)))
    np.testing.assert_allclose(outs[0][0], outs[1][0], rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(outs[0][1], outs[1][1], rtol=1e-4, atol=1e-4)


def test_protein_mixture_and_baseline_modes():
    from superdiff_tpu.models.protein import IPAConfig, IPAScoreNetwork, R3Diffuser, SE3Diffuser, SO3Diffuser, rigid
    from superdiff_tpu.pipelines.protein import CompositionConfig, compose

    se3 = SE3Diffuser(r3=R3Diffuser(), so3=SO3Diffuser(num_sigma=40, num_omega=80, L=80))
    n = 12
    net = IPAScoreNetwork(IPAConfig.tiny(), se3)
    feats0 = {
        "rigids_t": rigid.rigid_identity((1, n)),
        "res_mask": jnp.ones((1, n)),
        "fixed_mask": jnp.zeros((1, n)),
        "t": jnp.ones((1,)),
        "seq_idx": jnp.arange(n)[None],
        "sc_ca_t": jnp.zeros((1, n, 3)),
    }
    pa = net.init(jax.random.PRNGKey(0), feats0)["params"]
    pb = net.init(jax.random.PRNGKey(1), feats0)["params"]
    ma = lambda f, t: net.apply({"params": pa}, f)
    mb = lambda f, t: net.apply({"params": pb}, f)
    for method, expect in [("mixture", 0.5), ("baseline_a", 1.0), ("baseline_b", 0.0)]:
        cfg = CompositionConfig(num_t=5, mixing_method=method)
        out = compose(jax.random.PRNGKey(2), ma, mb, se3, n_res=n, cfg=cfg)
        k = np.asarray(out["traces"]["kappa_trans"])
        np.testing.assert_allclose(k, expect, atol=1e-6)
        assert np.isfinite(np.asarray(out["rigids"])).all()


def test_esm_gating_subschedule_flags():
    from superdiff_tpu.pipelines.protein import CompositionConfig

    import numpy as np

    cfg = CompositionConfig(num_t=10, esm_rate=0.3)
    num_esm = int(cfg.esm_rate * cfg.num_t)
    flags = np.zeros(cfg.num_t)
    flags[np.linspace(0, cfg.num_t - 1, num_esm, dtype=int)] = 1
    assert flags.sum() == 3  # 30% of 10 steps flagged


# -- NCSN layer zoo + conditional normalization (inventory parity) ----------


def test_ncsn_refineblock_shapes():
    """RefineNet pyramid: two scales fuse to the output shape
    (cifar/models/layers.py:237-273 semantics)."""
    import jax
    import jax.numpy as jnp

    from superdiff_tpu.models.ncsn_layers import RefineBlock

    k = jax.random.PRNGKey(0)
    x1 = jax.random.normal(k, (2, 8, 8, 16))
    x2 = jax.random.normal(k, (2, 4, 4, 16))
    blk = RefineBlock(output_shape=(8, 8), features=16)
    params = blk.init(k, [x1, x2])
    out = blk.apply(params, [x1, x2])
    assert out.shape == (2, 8, 8, 16)
    assert jnp.isfinite(out).all()
    # start/end variants
    blk_s = RefineBlock(output_shape=(4, 4), features=16, start=True, end=True)
    p2 = blk_s.init(k, [x2])
    assert blk_s.apply(p2, [x2]).shape == (2, 4, 4, 16)


def test_ncsn_cond_refineblock_uses_condition():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from superdiff_tpu.models.ncsn_layers import CondRefineBlock
    from superdiff_tpu.models.normalization import get_normalization

    norm = get_normalization("InstanceNorm++", conditional=True, num_classes=4)
    k = jax.random.PRNGKey(0)
    x1 = jax.random.normal(k, (2, 8, 8, 8))
    x2 = jax.random.normal(k, (2, 4, 4, 8))
    y = jnp.asarray([0, 1])
    blk = CondRefineBlock(output_shape=(8, 8), features=8, normalizer=norm)
    params = blk.init(k, [x1, x2], y)
    out = blk.apply(params, [x1, x2], y)
    assert out.shape == (2, 8, 8, 8)
    # a different class index changes the output (the condition is live)
    out2 = blk.apply(params, [x1, x2], jnp.asarray([2, 3]))
    assert not np.allclose(np.asarray(out), np.asarray(out2))


def test_conditional_instance_norm_plus_matches_reference_structure():
    """gamma/alpha start near 1, beta near 0: at init the conditional norm is
    close to the unconditional InstanceNorm++ with default params
    (normalization.py:110-134 init scheme)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from superdiff_tpu.models.normalization import (
        ConditionalInstanceNorm2dPlus,
        InstanceNorm2dPlus,
    )

    k = jax.random.PRNGKey(0)
    x = jax.random.normal(k, (2, 6, 6, 5)) * 2.0 + 1.0
    y = jnp.asarray([3, 7])
    cond = ConditionalInstanceNorm2dPlus(num_classes=10)
    pc = cond.init(k, x, y)
    out_c = cond.apply(pc, x, y)
    un = InstanceNorm2dPlus()
    pu = un.init(k, x)
    out_u = un.apply(pu, x)
    assert out_c.shape == out_u.shape == x.shape
    # both are ~N(0,1)-normalized re-scalings: same magnitude structure
    np.testing.assert_allclose(
        np.std(np.asarray(out_c)), np.std(np.asarray(out_u)), rtol=0.3
    )
    # different embeddings for different classes
    out_c2 = cond.apply(pc, x, jnp.asarray([1, 2]))
    assert not np.allclose(np.asarray(out_c), np.asarray(out_c2))


def test_mean_pool_conv_pairs_halve_resolution():
    import jax

    from superdiff_tpu.models.ncsn_layers import ConvMeanPool, MeanPoolConv

    k = jax.random.PRNGKey(0)
    x = jax.random.normal(k, (2, 8, 8, 4))
    for cls in (ConvMeanPool, MeanPoolConv):
        m = cls(output_dim=6)
        p = m.init(k, x)
        assert m.apply(p, x).shape == (2, 4, 4, 6)


def test_flops_audit_analytic_matches_known_sd_unet_cost():
    """The MFU denominator (scripts/flops_audit.py) must stay at the known
    SD-1.x UNet cost: ~339 GMAC = ~0.70 TFLOP per 512px image-forward.
    Guards against silent edits to the per-module accounting."""
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "flops_audit",
        os.path.join(os.path.dirname(__file__), "..", "scripts", "flops_audit.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    total, notes = mod.analytic_flops()
    assert abs(total / 1e12 - 0.7007) < 0.002, notes


def test_package_import_initializes_no_backend():
    """Importing superdiff_tpu (and the CLI) must not create device arrays:
    backend init at import time makes `--help` require a reachable chip, and
    on a dead tunnel relay the attach hangs forever instead of erroring.
    Run in a subprocess — the test process itself has live backends."""
    import subprocess
    import sys

    code = (
        "import superdiff_tpu, superdiff_tpu.cli, superdiff_tpu.eval, "
        "superdiff_tpu.pipelines; "
        "import jax._src.xla_bridge as xb; "
        "assert not xb._backends, list(xb._backends)"
    )
    proc = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True,
        timeout=600, cwd="/root/repo",
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
