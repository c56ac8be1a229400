"""Full protein SuperDiff workflow: train two SE(3) denoisers on different
structure families, compose them, write PDBs, screen the backbones, and draw
the structure-embedding map.

The reference's protein experiment end-to-end
(``applications/proteins/superdiff/inference.py`` + the analysis half of
``visualization/protein_umap.ipynb``), with the weight-gated externals
(pretrained checkpoints, ProteinMPNN, ESMFold, foldseek) replaced by
self-trained toy models: a local-attention Proteus-like net is SE(3)-DSM
trained on a *helical* backbone family and a FrameDiff-like net on an
*extended* family; OR composition samples along one shared reverse
trajectory with per-component (R3 / SO(3)) kappa and running
log-likelihoods; every backbone is written as a PDB and screened with the
dependency-free structural metrics (CA clashes, radius of gyration,
secondary-structure fractions); the TM-affinity structure map colors the
three sample families like the reference's UMAP figure — composition
samples should land on/between the two parents' clusters.

  python examples/protein_workflow.py [--length 32] [--steps 100]
      [--seeds 4] [--train_iters 400]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    from superdiff_tpu.utils.tunnel import require_tunnel

    require_tunnel('protein_workflow example')
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", default="/tmp/protein_wf")
    ap.add_argument("--length", type=int, default=32)
    ap.add_argument("--steps", type=int, default=100)
    ap.add_argument("--seeds", type=int, default=4)
    ap.add_argument("--train_iters", type=int, default=400)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from superdiff_tpu.data.pdb import parse_pdb
    from superdiff_tpu.eval import embed_viz
    from superdiff_tpu.eval.struct_metrics import (
        ca_ca_clashes,
        radius_of_gyration,
        secondary_structure_fractions,
    )
    from superdiff_tpu.models.protein import (
        IPAConfig,
        IPAScoreNetwork,
        SE3Diffuser,
        backbone,
        rigid,
    )
    from superdiff_tpu.models.protein import residue_constants as rc
    from superdiff_tpu.pipelines.protein import CompositionConfig, compose
    from superdiff_tpu.train import (
        init_train_state,
        make_optimizer,
        make_train_step,
    )
    from superdiff_tpu.train.se3_trainer import make_se3_dsm_loss
    from superdiff_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    os.makedirs(args.workdir, exist_ok=True)
    n = args.length

    se3 = SE3Diffuser.default()

    def family_rigids(kind):
        """A clean backbone per family: helical vs extended CA trace."""
        idx = jnp.arange(n)
        if kind == "helix":
            trans = jnp.stack(
                [2.3 * jnp.cos(idx * 1.7), 2.3 * jnp.sin(idx * 1.7),
                 1.5 * idx], -1)
            rotvec = jnp.stack(
                [0.3 * jnp.sin(idx * 0.5), 0.3 * jnp.cos(idx * 0.5),
                 0.1 * (idx % 10)], -1)
        else:  # extended strand
            trans = jnp.stack(
                [3.3 * idx, 1.0 * (idx % 2), 0.2 * idx], -1)
            rotvec = jnp.stack(
                [0.1 * (idx % 2), jnp.zeros_like(idx, jnp.float32),
                 0.05 * idx], -1)
        trans = trans - trans.mean(0)
        quat = rigid.rotmat_to_quat(rigid.rotvec_to_rotmat(rotvec))
        return rigid.rigid(quat, trans)

    feats0 = {
        "rigids_t": rigid.rigid_identity((1, n)),
        "res_mask": jnp.ones((1, n)),
        "fixed_mask": jnp.zeros((1, n)),
        "t": jnp.ones((1,)),
        "seq_idx": jnp.arange(n)[None],
        "sc_ca_t": jnp.zeros((1, n, 3)),
    }
    net_a = IPAScoreNetwork(
        IPAConfig(node_dim=64, edge_dim=32, num_blocks=3, num_heads=4,
                  local_attention_k=16), se3,
    )
    net_b = IPAScoreNetwork(
        IPAConfig(node_dim=48, edge_dim=24, num_blocks=2, num_heads=4), se3,
    )

    def train(net, data, key, iters):
        params = net.init(key, feats0)["params"]
        apply_fn = lambda p, feats, rng=None: net.apply({"params": p}, feats)
        loss_fn = make_se3_dsm_loss(apply_fn, se3)
        opt = make_optimizer(lr=1e-3, warmup=20)
        state = init_train_state(key, params, opt, ema_rate=0.99)
        step = make_train_step(opt, loss_fn, donate=False)
        batch = {
            "rigids_0": jnp.broadcast_to(data[None], (8, n, 7)),
            "res_mask": jnp.ones((8, n)),
            "seq_idx": jnp.broadcast_to(jnp.arange(n)[None], (8, n)),
        }
        first = last = None
        for i in range(iters):
            state, loss = step(state, batch)
            if i == 0:
                first = float(loss)
        last = float(loss)
        print(f"[protein_wf] trained: loss {first:.3f} -> {last:.3f}")
        return state.params

    print(f"[protein_wf] training model A (proteus-like) on the helix family")
    pa = train(net_a, family_rigids("helix"), jax.random.PRNGKey(1),
               args.train_iters)
    print(f"[protein_wf] training model B (framediff-like) on the extended family")
    pb = train(net_b, family_rigids("strand"), jax.random.PRNGKey(2),
               args.train_iters)
    ma = lambda feats, t: net_a.apply({"params": pa}, feats)
    mb = lambda feats, t: net_b.apply({"params": pb}, feats)

    def sample_family(name, method):
        cfg = CompositionConfig(
            num_t=args.steps, kappa_operator="OR", stochastic=True,
            mixing_method=method,
        )
        fam_dir = os.path.join(args.workdir, name)
        os.makedirs(fam_dir, exist_ok=True)
        rows, paths = [], []
        run = jax.jit(lambda k: compose(k, ma, mb, se3, n_res=n, cfg=cfg))
        for seed in range(args.seeds):
            out = run(jax.random.PRNGKey(100 + seed))
            at37 = np.asarray(out["atom37"][0])
            assert np.isfinite(at37).all(), (name, seed)
            path = os.path.join(fam_dir, f"len_{n}_seed_{seed}.pdb")
            with open(path, "w") as f:
                f.write(backbone.to_pdb(at37))
            paths.append(path)
            ca = at37[:, rc.CA_IDX]
            rows.append({
                "seed": seed,
                "clashes": ca_ca_clashes(ca),
                "rg": round(radius_of_gyration(ca), 2),
                **{k: round(v, 3)
                   for k, v in secondary_structure_fractions(ca).items()},
            })
            if method == "composition":
                kt = np.asarray(out["traces"]["kappa_trans"])
                print(f"[protein_wf] {name} seed {seed}: kappa_trans "
                      f"range [{kt.min():.3f}, {kt.max():.3f}]")
        print(f"[protein_wf] {name}: {rows}")
        return paths

    fam_paths = {
        "SuperDiff (OR)": sample_family("composition", "composition"),
        "model A (proteus-like)": sample_family("model_a", "baseline_a"),
        "model B (framediff-like)": sample_family("model_b", "baseline_b"),
    }

    # structure map over this run's three families (protein_umap.ipynb analog)
    samples = {
        name: [parse_pdb(p).atom37[:, rc.CA_IDX] for p in paths]
        for name, paths in fam_paths.items()
    }
    fig_path = os.path.join(args.workdir, "structure_map.png")
    res = embed_viz.structure_map(samples, out_png=fig_path)
    print(f"[protein_wf] wrote {fig_path} "
          f"({len(res['labels'])} structures, affinity "
          f"{np.asarray(res['affinity']).shape})")
    print("[protein_wf] OK")


if __name__ == "__main__":
    main()
