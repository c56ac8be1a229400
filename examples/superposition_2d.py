"""Executable 2-D superposition walkthrough (Figure-2 reproduction).

Script equivalent of the reference's educational notebooks
(``notebooks/diffusion_edu.ipynb`` + ``superposition_edu.ipynb``): train two
MLP score nets on disjoint 2-D mixtures, then compose them along one reverse
trajectory with all three kappa policies — OR (density softmax), AND
(closed-form equalization via the generic kappa), and fixed-average — saving
a sample-scatter figure per policy.

Run:  python examples/superposition_2d.py [--outdir /tmp/superpose2d]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from superdiff_tpu.core import (
    SuperposeConfig,
    VPSchedule,
    make_dsm_loss,
    superpose,
)
from superdiff_tpu.models import MLPScoreNet, make_stacked_score_fn, stack_params
from superdiff_tpu.train import init_train_state, make_optimizer, make_train_step

SCHED = VPSchedule()


def four_gaussians(key, n, which):
    """Two-of-four-Gaussians data: model 'up' sees the top modes, 'down' the
    bottom ones (the edu notebook's split)."""
    centers = {
        "up": jnp.asarray([[-2.0, 2.0], [2.0, 2.0]]),
        "down": jnp.asarray([[-2.0, -2.0], [2.0, -2.0]]),
    }[which]
    k1, k2 = jax.random.split(key)
    idx = jax.random.randint(k1, (n,), 0, 2)
    return centers[idx] + 0.3 * jax.random.normal(k2, (n, 2))


def train_model(key, which, n_iters=2000):
    model = MLPScoreNet(hidden=(128, 128), out_dim=2)
    params = model.init(key, jnp.zeros((1, 1)), jnp.zeros((1, 2)))["params"]

    def apply_fn(p, t, x, y, rng=None):
        return model.apply({"params": p}, t, x)

    loss_fn = make_dsm_loss(apply_fn, SCHED, t_0=1e-3)
    opt = make_optimizer(lr=2e-3, warmup=50)
    state = init_train_state(key, params, opt, ema_rate=0.99)
    step = make_train_step(opt, loss_fn, donate=False)
    for i in range(n_iters):
        batch = {"image": four_gaussians(jax.random.fold_in(key, i), 256, which)}
        state, loss = step(state, batch)
    print(f"{which}: final DSM loss {float(loss):.3f}")
    return model, state.params


def main():
    from superdiff_tpu.utils.tunnel import require_tunnel

    require_tunnel('superposition_2d example')
    ap = argparse.ArgumentParser()
    ap.add_argument("--outdir", default="/tmp/superpose2d")
    ap.add_argument("--n_samples", type=int, default=512)
    args = ap.parse_args()
    os.makedirs(args.outdir, exist_ok=True)

    model, params_up = train_model(jax.random.PRNGKey(0), "up")
    _, params_down = train_model(jax.random.PRNGKey(1), "down")

    def apply_fn(p, t, x, y=None):
        return model.apply({"params": p}, t, x)

    score_fn = make_stacked_score_fn(apply_fn, stack_params([params_up, params_down]))
    x1 = jax.random.normal(jax.random.PRNGKey(7), (args.n_samples, 2))

    results = {}
    for name, cfg in {
        "or_sde": SuperposeConfig(n_steps=400, mode="sde", operator="or"),
        "or_ode": SuperposeConfig(n_steps=400, mode="ode", operator="or"),
        "avg_sde": SuperposeConfig(n_steps=400, mode="sde", operator="avg"),
    }.items():
        x0, logq, nfe = jax.jit(
            lambda k, x, c=cfg: superpose(k, x, score_fn, SCHED, c, n_models=2)
        )(jax.random.PRNGKey(8), x1)
        x0 = np.asarray(x0)
        results[name] = x0
        up_frac = float(np.mean(x0[:, 1] > 0))
        print(f"{name}: nfe={nfe}, up-mode fraction {up_frac:.2f}")
        np.save(os.path.join(args.outdir, f"samples_{name}.npy"), x0)

    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, axes = plt.subplots(1, len(results), figsize=(4 * len(results), 4))
        for ax, (name, x0) in zip(np.atleast_1d(axes), results.items()):
            ax.scatter(x0[:, 0], x0[:, 1], s=4, alpha=0.5)
            ax.set_title(name)
            ax.set_xlim(-4, 4), ax.set_ylim(-4, 4)
        fig.savefig(os.path.join(args.outdir, "superposition_2d.png"), dpi=120)
        print(f"figure: {args.outdir}/superposition_2d.png")
    except Exception as e:
        print(f"(no figure: {e})")


if __name__ == "__main__":
    main()
