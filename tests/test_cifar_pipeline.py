"""CIFAR pipeline driver: tiny end-to-end train -> joint sample on CPU mesh."""

import os

import jax
import numpy as np
import pytest

from superdiff_tpu.pipelines import cifar as C


@pytest.fixture(scope="module")
def tiny_cfg():
    return C.CifarConfig(
        nf=16, ch_mult=(1, 2), num_res_blocks=1, attn_resolutions=(8,),
        batch_size=16, log_every=5, save_every=10, n_iters=10,
        eval_batch_size=8, n_sample_steps=4, compute_dtype="float32",
        image_size=16,
    )


def test_split_dsl_semantics():
    from superdiff_tpu.data.datasets import ImageDataset

    full = ImageDataset("cifar10", "train")
    half_a = ImageDataset("cifar10", "train[:50%]")
    half_b = ImageDataset("cifar10", "train[50%:]")
    assert len(half_a) + len(half_b) == len(full)
    lt5 = ImageDataset("cifar10", "train<5")
    ge5 = ImageDataset("cifar10", "train>5")
    assert np.all(lt5.labels < 5) and np.all(ge5.labels >= 5)
    assert len(lt5) + len(ge5) == len(full)


def test_train_and_resume(tmp_path, tiny_cfg):
    wd = str(tmp_path / "run")
    state = C.train(tiny_cfg, wd, n_iters=10)
    assert int(state.step) == 11
    assert os.path.exists(os.path.join(wd, "metrics.jsonl"))
    # preemption resume: a fresh call restores from the saved checkpoint
    state2 = C.train(tiny_cfg, wd, n_iters=12)
    assert int(state2.step) == 13  # resumed at 11, ran 2 more


def test_joint_generator(tiny_cfg):
    key = jax.random.PRNGKey(0)
    model = tiny_cfg.model()
    import jax.numpy as jnp

    x = jnp.zeros((1, tiny_cfg.image_size, tiny_cfg.image_size, 3))
    t = jnp.ones((1, 1, 1, 1))
    p1 = model.init({"params": key, "dropout": key}, t, x, None, train=False)["params"]
    p2 = model.init({"params": jax.random.PRNGKey(1), "dropout": key}, t, x, None, train=False)["params"]
    gen, n_steps = C.make_generator(model, [p1, p2], tiny_cfg, mode="sde", operator="or")
    x0, logq = gen(key)
    assert x0.shape == (8, 16, 16, 3)
    assert logq.shape == (8, 2)
    assert np.isfinite(np.asarray(x0)).all()
    assert n_steps == 4


def test_evaluate_joint_fid_with_stub_features(tmp_path, tiny_cfg):
    """Full eval_joint_fid path: generate -> features -> exact FID vs stats."""
    import dataclasses

    cfg = dataclasses.replace(tiny_cfg) if dataclasses.is_dataclass(tiny_cfg) else tiny_cfg
    cfg.num_samples = 16
    cfg.eval_batch_size = 8
    wd_a, wd_b = str(tmp_path / "a"), str(tmp_path / "b")
    C.train(cfg, wd_a, n_iters=3)
    C.train(cfg, wd_b, n_iters=3)

    rng = np.random.default_rng(0)
    ref_feats = rng.normal(size=(256, 6)).astype(np.float32)
    stats_path = str(tmp_path / "stats.npz")
    np.savez_compressed(stats_path, pool_3=ref_feats)

    def stub_features(imgs):
        # deterministic cheap embedding: channel means + quadrant means
        x = imgs.astype(np.float32) / 255.0
        return np.stack(
            [x.mean((1, 2, 3)), x[:, :8].mean((1, 2, 3)), x[:, 8:].mean((1, 2, 3)),
             x[..., 0].mean((1, 2)), x[..., 1].mean((1, 2)), x[..., 2].mean((1, 2))],
            axis=-1,
        )

    report = C.evaluate_joint_fid(
        cfg, str(tmp_path / "out"), [wd_a, wd_b], stoch=True,
        stats_path=stats_path, feature_fn=stub_features,
    )
    assert "fid" in report and np.isfinite(report["fid"])
    import os

    sample_dir = tmp_path / "out" / "eval" / "samples_stoch"
    assert len(list(sample_dir.glob("samples_*.npz"))) == 2  # 16/8 batches
