"""Protein stack tests: rotation algebra, diffusers, IPA net, composition."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from superdiff_tpu.models.protein import (
    IPAConfig,
    IPAScoreNetwork,
    R3Diffuser,
    SE3Diffuser,
    SO3Diffuser,
    backbone,
    rigid,
)


@pytest.fixture(scope="module")
def so3():
    return SO3Diffuser(num_sigma=100, num_omega=200, L=200)


@pytest.fixture(scope="module")
def se3(so3):
    return SE3Diffuser(r3=R3Diffuser(), so3=so3)


# -- rotation algebra -------------------------------------------------------


def test_quat_rotmat_roundtrip():
    q = jax.random.normal(jax.random.PRNGKey(0), (64, 4))
    q = rigid.quat_normalize(q)
    q = q * jnp.where(q[..., :1] < 0, -1.0, 1.0)
    m = rigid.quat_to_rotmat(q)
    # orthonormal, det +1
    eye = jnp.einsum("...ij,...kj->...ik", m, m)
    np.testing.assert_allclose(np.asarray(eye), np.tile(np.eye(3), (64, 1, 1)), atol=1e-5)
    np.testing.assert_allclose(np.asarray(jnp.linalg.det(m)), 1.0, atol=1e-5)
    q2 = rigid.rotmat_to_quat(m)
    np.testing.assert_allclose(np.asarray(q2), np.asarray(q), atol=1e-4)


def test_rotvec_roundtrip_and_compose():
    v = jax.random.normal(jax.random.PRNGKey(1), (32, 3))
    m = rigid.rotvec_to_rotmat(v)
    v2 = rigid.rotmat_to_rotvec(m)
    # same rotation (vector may differ by 2pi wrap for |v| near pi; keep |v|<pi)
    v_small = 0.8 * v / jnp.linalg.norm(v, axis=-1, keepdims=True)
    np.testing.assert_allclose(
        np.asarray(rigid.rotmat_to_rotvec(rigid.rotvec_to_rotmat(v_small))),
        np.asarray(v_small),
        atol=1e-4,
    )
    # compose matches matrix product
    a = 0.5 * jax.random.normal(jax.random.PRNGKey(2), (8, 3))
    b = 0.5 * jax.random.normal(jax.random.PRNGKey(3), (8, 3))
    lhs = rigid.rotvec_to_rotmat(rigid.rotvec_compose(a, b))
    rhs = rigid.rotvec_to_rotmat(a) @ rigid.rotvec_to_rotmat(b)
    np.testing.assert_allclose(np.asarray(lhs), np.asarray(rhs), atol=1e-4)


def test_rotvec_zero_is_identity():
    m = rigid.rotvec_to_rotmat(jnp.zeros((3,)))
    np.testing.assert_allclose(np.asarray(m), np.eye(3), atol=1e-6)


# -- R3 diffuser ------------------------------------------------------------


def test_r3_gaussian_score_consistency():
    """forward_marginal's returned score matches the analytic Gaussian score."""
    r3 = R3Diffuser()
    key = jax.random.PRNGKey(0)
    x0 = jax.random.normal(key, (1000, 3)) * 10.0
    t = 0.5
    x_t, score = r3.forward_marginal(jax.random.PRNGKey(1), x0, t)
    x_ts = r3.scale(x_t)
    expected = r3.score(x_ts, r3.scale(x0), t)
    np.testing.assert_allclose(np.asarray(score), np.asarray(expected), rtol=1e-4)
    # marginal statistics: std ~ sqrt(conditional_var)
    resid = x_ts - np.exp(-0.5 * r3.marginal_b_t(t)) * r3.scale(x0)
    np.testing.assert_allclose(
        np.std(np.asarray(resid)), np.sqrt(r3.conditional_var(t)), rtol=0.05
    )


# -- SO3 diffuser -----------------------------------------------------------


def test_igso3_small_sigma_score_matches_gaussian(so3):
    """For small sigma, IGSO(3) ~ Gaussian on the tangent: score ~ -omega/sigma^2."""
    t = 0.0  # sigma = min_sigma = 0.1
    sigma = float(so3.sigma(t))
    v = jnp.asarray([[0.05, 0.0, 0.0]])
    s = so3.score(v, t)
    # score direction along -v; magnitude near (d/domega log f) ~ -omega/sigma^2 + curvature
    expected = -0.05 / sigma**2
    assert np.sign(np.asarray(s)[0, 0]) == -1.0
    np.testing.assert_allclose(np.asarray(s)[0, 0], expected, rtol=0.1)


def test_igso3_sampling_statistics(so3):
    """At t=1 (sigma=1.5) samples should be broadly distributed over (0, pi)."""
    rots = so3.sample(jax.random.PRNGKey(0), jnp.asarray(1.0), (4000,))
    angles = np.linalg.norm(np.asarray(rots), axis=-1)
    assert 0.0 < angles.min() and angles.max() <= np.pi + 1e-6
    assert 1.5 < angles.mean() < 2.6  # near-uniform haar mean ~ 2.17


def test_so3_score_scaling_monotone(so3):
    hi = float(so3.score_scaling(jnp.asarray(0.0)))
    lo = float(so3.score_scaling(jnp.asarray(1.0)))
    assert hi > lo > 0  # scores shrink as noise grows


# -- SE3 + IPA network ------------------------------------------------------


def _tiny_net(se3):
    cfg = IPAConfig.tiny()
    net = IPAScoreNetwork(cfg, se3)
    n, b = 16, 2
    feats = {
        "rigids_t": rigid.rigid_identity((b, n)),
        "res_mask": jnp.ones((b, n)),
        "fixed_mask": jnp.zeros((b, n)),
        "t": 0.5 * jnp.ones((b,)),
        "seq_idx": jnp.broadcast_to(jnp.arange(n)[None], (b, n)),
        "sc_ca_t": jnp.zeros((b, n, 3)),
    }
    params = net.init(jax.random.PRNGKey(0), feats)["params"]
    return net, params, feats


def test_ipa_network_shapes_and_equivariance_smoke(se3):
    net, params, feats = _tiny_net(se3)
    out = net.apply({"params": params}, feats)
    b, n = feats["res_mask"].shape
    assert out["rigids"].shape == (b, n, 7)
    assert out["trans_score"].shape == (b, n, 3)
    assert out["rot_score"].shape == (b, n, 3)
    assert out["psi"].shape == (b, n, 2)
    assert np.all(np.isfinite(np.asarray(out["rigids"])))


def test_se3_reverse_step_and_external_dx(se3):
    key = jax.random.PRNGKey(0)
    rigids = se3.sample_ref(key, n_res=8, batch=2)
    score_r = 0.1 * jax.random.normal(jax.random.PRNGKey(1), (2, 8, 3))
    score_t = 0.1 * jax.random.normal(jax.random.PRNGKey(2), (2, 8, 3))
    out = se3.reverse(key, rigids, score_r, score_t, 0.5, 1.0 / 500, stochastic=True)
    assert out.shape == rigids.shape
    # quaternion stays unit
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(out[..., :4]), axis=-1), 1.0, atol=1e-5
    )
    # external dx: zero deltas freeze the state (up to centering)
    frozen = se3.reverse(
        key, rigids, score_r, score_t, 0.5, 1.0 / 500,
        dx_trans=jnp.zeros((2, 8, 3)), dx_rots=jnp.zeros((2, 8, 3)), center=False,
    )
    np.testing.assert_allclose(np.asarray(frozen), np.asarray(rigids), atol=1e-5)


def test_backbone_atom37_and_pdb():
    rigids = rigid.rigid_identity((4,))
    rigids = rigids.at[..., 4:].add(jnp.arange(4)[:, None] * 3.8)
    atoms = backbone.to_atom37(rigids)
    assert atoms.shape == (4, 37, 3)
    ca = np.asarray(atoms[:, backbone.ATOM37_CA])
    np.testing.assert_allclose(np.diff(ca[:, 0]), 3.8, atol=1e-5)
    pdb = backbone.to_pdb(np.asarray(atoms))
    assert pdb.count("ATOM") == 4 * 5 and pdb.strip().endswith("END")


# -- composition end-to-end (tiny) ------------------------------------------


def test_composition_runs_and_traces(se3):
    from superdiff_tpu.pipelines.protein import CompositionConfig, compose

    net, params, _ = _tiny_net(se3)
    net2_cfg = IPAConfig.tiny()
    net2 = IPAScoreNetwork(net2_cfg, se3)
    n = 16
    feats0 = {
        "rigids_t": rigid.rigid_identity((1, n)),
        "res_mask": jnp.ones((1, n)),
        "fixed_mask": jnp.zeros((1, n)),
        "t": jnp.ones((1,)),
        "seq_idx": jnp.broadcast_to(jnp.arange(n)[None], (1, n)),
        "sc_ca_t": jnp.zeros((1, n, 3)),
    }
    params2 = net2.init(jax.random.PRNGKey(7), feats0)["params"]

    def model_a(feats, t):
        return net.apply({"params": params}, feats)

    def model_b(feats, t):
        return net2.apply({"params": params2}, feats)

    cfg = CompositionConfig(num_t=8, kappa_operator="OR")
    out = compose(jax.random.PRNGKey(0), model_a, model_b, se3, n_res=n, cfg=cfg)
    assert out["rigids"].shape == (1, n, 7)
    assert out["atom37"].shape == (1, n, 37, 3)
    assert np.all(np.isfinite(np.asarray(out["rigids"])))
    tr = out["traces"]
    assert tr["kappa_trans"].shape == (cfg.num_t - 1, 1)
    # OR kappas stay in [0, 1]
    assert np.all((np.asarray(tr["kappa_trans"]) >= 0) & (np.asarray(tr["kappa_trans"]) <= 1))
    # AND operator also runs
    cfg2 = CompositionConfig(num_t=8, kappa_operator="AND")
    out2 = compose(jax.random.PRNGKey(0), model_a, model_b, se3, n_res=n, cfg=cfg2)
    assert np.all(np.isfinite(np.asarray(out2["rigids"])))


def test_proteus_like_local_attention(se3):
    """The proteus-like config (k-NN local attention) runs and differs from
    framediff-like outputs on the same inputs."""
    from superdiff_tpu.models.protein.ipa import IPAConfig, IPAScoreNetwork

    n, b = 24, 1
    feats = {
        "rigids_t": rigid.rigid_identity((b, n)).at[..., 4:].add(
            jnp.arange(n)[None, :, None] * 3.8
        ),
        "res_mask": jnp.ones((b, n)),
        "fixed_mask": jnp.zeros((b, n)),
        "t": 0.5 * jnp.ones((b,)),
        "seq_idx": jnp.broadcast_to(jnp.arange(n)[None], (b, n)),
        "sc_ca_t": jnp.zeros((b, n, 3)),
    }
    cfg_local = IPAConfig.tiny()
    cfg_local = type(cfg_local)(**{**cfg_local.__dict__, "local_attention_k": 4})
    net = IPAScoreNetwork(cfg_local, se3)
    params = net.init(jax.random.PRNGKey(0), feats)["params"]
    out = net.apply({"params": params}, feats)
    assert np.all(np.isfinite(np.asarray(out["rigids"])))
    # same params, full attention -> different node features (psi head is
    # non-zero-init; score heads are zero-init so equal at init by design)
    net_full = IPAScoreNetwork(IPAConfig.tiny(), se3)
    out_full = net_full.apply({"params": params}, feats)
    assert not np.allclose(np.asarray(out["psi"]), np.asarray(out_full["psi"]))
