"""CIFAR experiment driver: train / eval_fid / eval_joint_fid / fid_stats.

TPU-native rebuild of ``cifar/main.py`` + ``cifar/run_lib.py``: the same six
modes, but the sampler is one compiled ``lax.scan`` program, training runs
under jit+mesh sharding, and all artifacts are local npz/JSONL (wandb
optional, absent in this environment).
"""

from __future__ import annotations

import dataclasses
import io
import json
import math
import os
import time
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..core import SuperposeConfig, VPSchedule, make_dsm_loss, superpose
from ..data.datasets import ImageDataset, PrefetchIterator, get_image_inverse_scaler
from ..eval import fid as fid_lib
from ..models import ScoreUNet, make_stacked_score_fn, stack_params
from ..parallel import make_mesh, shard_batch
from ..train import (
    checkpoints as ckpt_lib,
    init_train_state,
    make_optimizer,
    make_train_step,
)
from ..utils.logging import MetricLogger


@dataclasses.dataclass
class CifarConfig:
    """Hyper-parameters of the reference base config
    (``cifar/configs/sm/cifar/vpsde.py``)."""

    seed: int = 1
    dataset: str = "cifar10"
    train_split: str = "train"
    image_size: int = 32
    num_channels: int = 3
    num_classes: int = 10
    conditioned: bool = False
    # model
    nf: int = 128
    ch_mult: Sequence[int] = (1, 2, 2, 2)
    num_res_blocks: int = 2
    attn_resolutions: Sequence[int] = (16, 8)
    dropout: float = 0.1
    ema_rate: float = 0.9999
    compute_dtype: str = "bfloat16"  # TPU-first default; fp32 for parity runs
    # training
    batch_size: int = 128
    n_iters: int = 500_000
    save_every: int = 5_000
    eval_every: int = 10_000
    log_every: int = 50
    lr: float = 2e-4
    warmup: int = 5_000
    grad_clip: float = 1.0
    t_0: float = 0.0
    t_1: float = 1.0
    # eval
    eval_batch_size: int = 100
    num_samples: int = 50_000
    n_sample_steps: int = 200  # dt = 5e-3 (eval_utils.py:75)
    n_train_sample_steps: int = 100  # dt = 1e-2 (eval_utils.py:56)

    def model(self) -> ScoreUNet:
        return ScoreUNet(
            nf=self.nf,
            ch_mult=tuple(self.ch_mult),
            num_res_blocks=self.num_res_blocks,
            attn_resolutions=tuple(self.attn_resolutions),
            dropout=self.dropout,
            num_classes=self.num_classes if self.conditioned else None,
            dtype=jnp.bfloat16 if self.compute_dtype == "bfloat16" else jnp.float32,
        )


# Named configs mirroring cifar/configs/sm/cifar/*.py
def config_vpsde(**kw) -> CifarConfig:
    return CifarConfig(**kw)


def config_vpsde_a(**kw) -> CifarConfig:
    return CifarConfig(conditioned=True, train_split="train[:50%]", **kw)


def config_vpsde_b(**kw) -> CifarConfig:
    return CifarConfig(conditioned=True, train_split="train[50%:]", **kw)


def config_vpsde_less_5(**kw) -> CifarConfig:
    return CifarConfig(train_split="train<5", **kw)


def config_vpsde_more_5(**kw) -> CifarConfig:
    return CifarConfig(train_split="train>5", **kw)


CONFIGS = {
    "vpsde": config_vpsde,
    "vpsdeA": config_vpsde_a,
    "vpsdeB": config_vpsde_b,
    "vpsde_less_5": config_vpsde_less_5,
    "vpsde_more_5": config_vpsde_more_5,
}


def _apply_fn(model):
    def apply_fn(params, t, x, y, rng=None):
        if rng is not None:
            return model.apply({"params": params}, t, x, y, train=True, rngs={"dropout": rng})
        return model.apply({"params": params}, t, x, y, train=False)

    return apply_fn


def init_state(key, cfg: CifarConfig, workdir: str):
    """Init or restore (preemption-safe) the training state."""
    model = cfg.model()
    x = jnp.zeros((1, cfg.image_size, cfg.image_size, cfg.num_channels))
    t = jnp.zeros((1, 1, 1, 1))
    y = jnp.zeros((1,), jnp.int32) if cfg.conditioned else None
    key, init_key, drop_key = jax.random.split(key, 3)
    params = model.init({"params": init_key, "dropout": drop_key}, t, x, y, train=True)["params"]
    opt = make_optimizer(cfg.lr, cfg.warmup, grad_clip=cfg.grad_clip)
    state = init_train_state(key, params, opt, ema_rate=cfg.ema_rate)
    mgr = ckpt_lib.make_manager(workdir)
    restored = ckpt_lib.restore_latest(mgr, state)
    if restored is not None:
        state = restored
    return model, state, opt, mgr


def make_generator(
    model,
    params_list,
    cfg: CifarConfig,
    *,
    mode: str = "sde",
    operator: str = "or",
    n_steps: Optional[int] = None,
    labels=None,
    score_mode: str = "unroll",
):
    """Jitted batch sampler over the superposition of the given checkpoints.

    ``score_mode``: 'unroll' (fastest on one chip, ~6-20%, but compiles one
    UNet body per model — at full reference size the 2-model program can
    exceed remote-compile request limits) or 'vmap' (one shared body).
    """
    schedule = VPSchedule()
    stacked = stack_params(list(params_list))

    def apply_eval(p, t, x, y):
        return model.apply({"params": p}, t, x, y, train=False)

    sp_cfg = SuperposeConfig(
        n_steps=n_steps or cfg.n_sample_steps, mode=mode, operator=operator,
        # fused Pallas epilogue: measured +4% throughput and ~3x faster
        # compile for the 200-step joint sampler on v5e
        fused_kernel=(jax.default_backend() == "tpu" and mode == "sde" and operator == "or"),
    )
    shape = (cfg.eval_batch_size, cfg.image_size, cfg.image_size, cfg.num_channels)
    n_models = len(params_list)

    # params enter as a jit ARGUMENT, not a closure: closed-over trees become
    # HLO constants, and two full-size UNets (~290 MB fp32) embedded in the
    # program exceed the tunneled remote-compiler's request size limit
    # (HTTP 413) — and bloat the compile cache either way.
    @jax.jit
    def _generate(params, key):
        score_fn = make_stacked_score_fn(apply_eval, params, labels=labels, mode=score_mode)
        init_key, path_key = jax.random.split(key)
        x1 = jax.random.normal(init_key, shape)
        x0, logq, nfe = superpose(path_key, x1, score_fn, schedule, sp_cfg, n_models)
        return x0, logq

    def generate(key):
        return _generate(stacked, key)

    return generate, sp_cfg.n_steps


def train(
    cfg: CifarConfig,
    workdir: str,
    n_iters: Optional[int] = None,
    *,
    eval_artifacts: bool = False,
    estimate_bpd: bool = False,
):
    """Training mode (``run_lib.py:55-126``): DSM + EMA + periodic ckpt/eval.

    ``eval_artifacts`` generates a 64-sample grid every ``eval_every`` steps
    (the reference's wandb.Image loop, ``run_lib.py:110-125``);
    ``estimate_bpd`` additionally logs bits/dim on the current batch (the
    estimator the reference keeps commented out, ``run_lib.py:121-126``).
    """
    os.makedirs(workdir, exist_ok=True)
    key = jax.random.PRNGKey(cfg.seed)
    model, state, opt, mgr = init_state(key, cfg, workdir)
    schedule = VPSchedule()
    loss_fn = make_dsm_loss(_apply_fn(model), schedule, t_0=cfg.t_0, t_1=cfg.t_1)
    mesh = make_mesh(model=1)
    step_fn = make_train_step(opt, loss_fn, mesh=mesh)
    ds = ImageDataset(cfg.dataset, cfg.train_split, seed=cfg.seed,
                      image_size=cfg.image_size)
    it = PrefetchIterator(ds.batches(cfg.batch_size))
    logger = MetricLogger(os.path.join(workdir, "metrics.jsonl"))

    bpd_fn = None
    initial = int(state.step)
    total = n_iters or cfg.n_iters
    t_start = time.time()
    for step in range(initial, total + 1):
        host_batch = next(it)
        batch = shard_batch(host_batch, mesh)
        state, loss = step_fn(state, batch)
        if step % cfg.log_every == 0:
            logger.log(step=step, loss=float(loss),
                       steps_per_sec=cfg.log_every / max(time.time() - t_start, 1e-9))
            t_start = time.time()
        if step % cfg.save_every == 0:
            # id = the actual step: interval-relative ids (step//save_every)
            # collide across runs with different save_every, and orbax will
            # not overwrite an existing id — the later save silently loses
            # and a resume restores the older state.
            ckpt_lib.save(mgr, step, jax.device_get(state))
        if eval_artifacts and step % cfg.eval_every == 0:
            labels = (
                jnp.tile(jnp.arange(10), cfg.eval_batch_size // 10 + 1)[: cfg.eval_batch_size]
                if cfg.conditioned else None
            )
            gen, nfe = make_generator(
                model, [state.params], cfg, mode="sde", operator="avg",
                n_steps=cfg.n_train_sample_steps, labels=labels,
            )
            x0, _ = gen(jax.random.fold_in(key, step))
            from ..utils.images import stack_imgs

            inverse = get_image_inverse_scaler()
            side = min(8, int(np.sqrt(x0.shape[0])))
            grid = stack_imgs(np.asarray(inverse(x0)), side, side)
            np.savez_compressed(
                os.path.join(workdir, f"artifacts_{step}.npz"), grid=grid
            )
            logger.log(step=step, nfe=nfe, artifact=f"artifacts_{step}.npz")
            if estimate_bpd:
                from ..eval.bpd import make_bpd_estimator

                if bpd_fn is None:
                    @jax.jit
                    def bpd_fn(params, k, x):
                        def score_apply(t, xx):
                            return model.apply(
                                {"params": params},
                                jnp.broadcast_to(t, (xx.shape[0], 1, 1, 1)),
                                xx, None, train=False,
                            )

                        return make_bpd_estimator(score_apply, schedule, n_steps=50)(k, x)

                bpd_val, _ = bpd_fn(state.params, jax.random.fold_in(key, step + 1),
                                    jnp.asarray(host_batch["image"]))
                logger.log(step=step, bpd=float(bpd_val))
    return state


def _generate_and_collect(generate, cfg: CifarConfig, key, sample_dir, feature_fn):
    inverse = get_image_inverse_scaler()
    num_batches = math.ceil(cfg.num_samples / cfg.eval_batch_size)
    all_feats = []
    for batch_id in range(num_batches):
        key, gen_key = jax.random.split(key)
        x0, logq = generate(gen_key)
        imgs = np.asarray(jnp.clip(inverse(x0) * 255.0, 0, 255).astype(jnp.uint8))
        np.savez_compressed(os.path.join(sample_dir, f"samples_{batch_id}.npz"), samples=imgs)
        if feature_fn is not None:
            all_feats.append(feature_fn(imgs))
    return np.concatenate(all_feats, axis=0)[: cfg.num_samples] if all_feats else None


def evaluate_joint_fid(
    cfg: CifarConfig,
    workdir: str,
    checkpoint_dirs: Sequence[str],
    *,
    stoch: bool = True,
    operator: str = "or",
    eval_folder: str = "eval",
    stats_path: Optional[str] = None,
    inception_weights: Optional[str] = None,
    feature_fn=None,
):
    """SuperDiff joint FID over N checkpoints (``run_lib.py:201-278``).

    ``feature_fn(uint8_images) -> (N, D)`` overrides the Inception extractor
    (pluggable features: DINOv2, a custom embedder, or a test stub).
    """
    key = jax.random.PRNGKey(cfg.seed)
    model = cfg.model()
    params_list = []
    for cdir in checkpoint_dirs:
        _, state, _, _ = init_state(key, cfg, cdir)
        params_list.append(state.params_ema)
    labels = jnp.tile(jnp.arange(10), cfg.eval_batch_size // 10 + 1)[: cfg.eval_batch_size] if cfg.conditioned else None
    generate, _ = make_generator(
        model, params_list, cfg, mode="sde" if stoch else "ode", operator=operator, labels=labels
    )
    sample_dir = os.path.join(workdir, eval_folder, "samples_stoch" if stoch else "samples")
    os.makedirs(sample_dir, exist_ok=True)
    if feature_fn is None:
        feature_fn = fid_lib.get_inception_feature_fn(inception_weights)
    feats = _generate_and_collect(generate, cfg, key, sample_dir, feature_fn)
    report = {}
    if feats is not None and stats_path:
        ref = fid_lib.load_dataset_stats(stats_path)
        report["fid"] = fid_lib.fid_from_features(ref, feats)
    with open(os.path.join(workdir, eval_folder, "report.json"), "w") as f:
        json.dump(report, f)
    return report


def evaluate_fid(cfg, workdir, *, stoch=True, **kw):
    """Single-model FID via the averaged field of one model (``run_lib.py:129-198``)."""
    return evaluate_joint_fid(cfg, workdir, [workdir], stoch=stoch, operator="avg", **kw)


def fid_stats(
    cfg: CifarConfig,
    workdir: str,
    *,
    fid_folder: str = "assets/stats",
    inception_weights: Optional[str] = None,
):
    """Precompute dataset pool3 statistics (``run_lib.py:281-324``): one npz
    per split in the reference's ``{dataset}_{split}_stats.npz`` format."""
    feature_fn = fid_lib.get_inception_feature_fn(inception_weights)
    if feature_fn is None:
        raise RuntimeError(
            "Inception weights unavailable; pass inception_weights=<local .h5>"
        )
    out_dir = os.path.join(workdir, fid_folder)
    os.makedirs(out_dir, exist_ok=True)
    for split in ("train", "test"):
        ds = ImageDataset(cfg.dataset, split, seed=cfg.seed,
                          image_size=cfg.image_size)
        feats = []
        for batch in ds.batches(
            cfg.eval_batch_size, uniform_dequantization=False,
            random_flip=False, scale_to_pm1=False, loop=False,
        ):
            imgs = (batch["image"] * 255).astype(np.uint8)
            feats.append(feature_fn(imgs))
        pools = np.concatenate(feats, axis=0)
        path = os.path.join(out_dir, f"{cfg.dataset.lower()}_{split}_stats.npz")
        np.savez_compressed(path, pool_3=pools)
    return out_dir
