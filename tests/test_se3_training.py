"""SE(3) DSM training: loss decreases on a fixed-structure toy task."""

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
    rigid,
)
from superdiff_tpu.train import init_train_state, make_optimizer, make_train_step
from superdiff_tpu.train.se3_trainer import make_se3_dsm_loss, se3_forward_marginal


@pytest.fixture(scope="module")
def se3():
    return SE3Diffuser(r3=R3Diffuser(), so3=SO3Diffuser(num_sigma=50, num_omega=100, L=100))


def _helix_rigids(n):
    """A fixed synthetic backbone (helix-ish) as the clean data."""
    idx = jnp.arange(n)
    trans = jnp.stack(
        [2.3 * jnp.cos(idx * 1.7), 2.3 * jnp.sin(idx * 1.7), 1.5 * idx], axis=-1
    )
    trans = trans - trans.mean(0)
    rotvec = jnp.stack([0.3 * jnp.sin(idx * 0.5), 0.3 * jnp.cos(idx * 0.5), 0.1 * idx % 1.0], -1)
    quat = rigid.rotmat_to_quat(rigid.rotvec_to_rotmat(rotvec))
    return rigid.rigid(quat, trans)


def test_forward_marginal_targets_consistent(se3):
    """Regression targets equal the adapter scores at the sampled point."""
    r0 = _helix_rigids(12)[None]
    t = jnp.asarray(0.5)
    rigids_t, tgt_tr, tgt_ro = se3_forward_marginal(jax.random.PRNGKey(0), se3, r0, t)
    tr = se3.calc_trans_score(
        rigid.rigid_trans(rigids_t), rigid.rigid_trans(r0), t
    )
    ro = se3.calc_rot_score(
        rigid.rigid_rotmat(rigids_t), rigid.rigid_rotmat(r0), t
    )
    np.testing.assert_allclose(np.asarray(tgt_tr), np.asarray(tr), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(tgt_ro), np.asarray(ro), rtol=1e-3, atol=1e-4)


def test_se3_training_loss_decreases(se3):
    n = 12
    net = IPAScoreNetwork(IPAConfig.tiny(), se3)
    data = _helix_rigids(n)

    feats0 = {
        "rigids_t": data[None],
        "res_mask": jnp.ones((1, n)),
        "fixed_mask": jnp.zeros((1, n)),
        "t": jnp.ones((1,)),
        "seq_idx": jnp.arange(n)[None],
        "sc_ca_t": jnp.zeros((1, n, 3)),
    }
    params = net.init(jax.random.PRNGKey(0), feats0)["params"]

    def apply_fn(p, feats, rng=None):
        return net.apply({"params": p}, feats)

    loss_fn = make_se3_dsm_loss(apply_fn, se3)
    opt = make_optimizer(lr=1e-3, warmup=10)
    state = init_train_state(jax.random.PRNGKey(1), params, opt, ema_rate=0.99)
    step = make_train_step(opt, loss_fn, donate=False)
    batch = {
        "rigids_0": jnp.broadcast_to(data[None], (4, n, 7)),
        "res_mask": jnp.ones((4, n)),
        "seq_idx": jnp.broadcast_to(jnp.arange(n)[None], (4, n)),
    }
    losses = []
    for _ in range(60):
        state, loss = step(state, batch)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert np.mean(losses[-10:]) < np.mean(losses[:10]), (losses[:3], losses[-3:])
