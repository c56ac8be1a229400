"""Unified experiment CLI — the L6 driver layer.

One coherent argparse surface replacing the reference's three config systems
(SURVEY.md §5.6: absl+ml_collections for CIFAR ``cifar/main.py:14-40``,
argparse for SD ``clip_eval.py:531-547``, hydra for proteins
``superdiff/inference.py:226``):

  python -m superdiff_tpu.cli cifar --mode train --config vpsde --workdir w
  python -m superdiff_tpu.cli cifar --mode eval_joint_fid --chkpts a,b --stoch
  python -m superdiff_tpu.cli sd --method and --obj "a cat" --bg "a dog"
  python -m superdiff_tpu.cli protein --length 100 --operator OR

Every run writes a config snapshot + metrics JSONL next to its outputs
(the reference's hydra-snapshot behavior, ``inference.py:181-182``).
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def _snapshot(args, workdir: str):
    os.makedirs(workdir, exist_ok=True)
    with open(os.path.join(workdir, "config_snapshot.json"), "w") as f:
        json.dump(vars(args), f, indent=2, default=str)


def cmd_cifar(args):
    from .pipelines import cifar as C

    cfg = C.CONFIGS[args.config]()
    if args.batch_size:
        cfg.batch_size = args.batch_size
    _snapshot(args, args.workdir)
    if args.mode == "train":
        C.train(cfg, args.workdir, n_iters=args.n_iters)
    elif args.mode == "eval_fid":
        print(C.evaluate_fid(cfg, args.workdir, stoch=args.stoch,
                             stats_path=args.stats_path,
                             inception_weights=args.inception_weights))
    elif args.mode == "eval_joint_fid":
        chkpts = args.chkpts.split(",")
        print(C.evaluate_joint_fid(cfg, args.workdir, chkpts, stoch=args.stoch,
                                   stats_path=args.stats_path,
                                   inception_weights=args.inception_weights))
    elif args.mode == "fid_stats":
        print(C.fid_stats(cfg, args.workdir, inception_weights=args.inception_weights))
    else:
        raise SystemExit(f"unknown cifar mode {args.mode}")


def cmd_sd(args):
    import numpy as np

    from .pipelines import sd as S
    from .eval import clip_metrics

    cfg = S.SDPipelineConfig(
        num_inference_steps=args.num_inference_steps,
        guidance_scale=args.guidance_scale,
        height=args.height, width=args.width,
        temperature=args.T, logp=args.logp, lift=args.lift,
    )
    import jax

    if args.preset == "tiny":
        from .models.sd.clip import CLIPTextConfig
        from .models.sd.unet import SDUNetConfig
        from .models.sd.vae import VAEConfig

        mod = S.build_sd_modules(
            jax.random.PRNGKey(0),
            unet_config=SDUNetConfig.tiny(),
            text_config=CLIPTextConfig.tiny(),
            vae_config=VAEConfig.tiny(),
            height=args.height, width=args.width,
        )
    else:
        mod = S.build_sd_modules(
            jax.random.PRNGKey(0), weights_dir=args.weights_dir,
            height=args.height, width=args.width,
        )
    _snapshot(args, args.out_dir)
    out = S.generate(
        mod, args.method, args.obj, args.bg,
        seed=args.seed, batch_size=args.batch_size, cfg=cfg,
    )
    method_dir = os.path.join(args.out_dir, args.method if args.T == 1 else f"{args.method}_T{args.T}")
    pair = f"{args.obj.replace(' ', '_')}_and_{args.bg.replace(' ', '_')}"
    img_dir = os.path.join(method_dir, pair)
    os.makedirs(img_dir, exist_ok=True)
    np.savez_compressed(os.path.join(img_dir, "latents.npz"), latents=np.asarray(out["latents"]))
    try:
        from PIL import Image

        for i, img in enumerate(out["images"]):
            Image.fromarray(img).save(os.path.join(img_dir, f"{i}.png"))
    except Exception:
        pass
    metrics = {}
    scorer = clip_metrics.get_clip_scorer()
    if scorer is not None:
        metrics["clip"] = scorer(out["images"], args.obj, args.bg)
    ir = clip_metrics.get_image_reward_scorer()
    if ir is not None:
        metrics["image_reward"] = ir(out["images"], args.obj, args.bg)
    metrics["final_ll_obj"] = np.asarray(out["traces"]["final_ll_obj"]).tolist()
    metrics["final_ll_bg"] = np.asarray(out["traces"]["final_ll_bg"]).tolist()
    mdir = os.path.join(args.out_dir, f"metrics_{args.method}")
    os.makedirs(mdir, exist_ok=True)
    with open(os.path.join(mdir, f"metrics_{args.method}_{pair}.json"), "w") as f:
        json.dump(metrics, f, indent=2)
    print(json.dumps({k: v for k, v in metrics.items() if "ll" in k}))


def cmd_protein(args):
    import jax
    import numpy as np

    from .models.protein import IPAConfig, IPAScoreNetwork, SE3Diffuser, backbone, rigid
    from .pipelines.protein import CompositionConfig, compose

    if args.batch < 1:
        raise SystemExit("--batch must be >= 1")
    if args.num_t < 2:
        raise SystemExit("--num_t must be >= 2 (one stepped interval)")
    try:
        lengths_list = (
            [int(x) for x in args.lengths.split(",")] if args.lengths else None
        )
    except ValueError:
        raise SystemExit(f"--lengths must be a comma list of ints, got {args.lengths!r}")

    se3 = SE3Diffuser.default()
    cfg = CompositionConfig(
        num_t=args.num_t, min_t=args.min_t,
        mixing_method=args.mixing_method, kappa_operator=args.operator,
        temp_trans=args.temp_trans, temp_rots=args.temp_rots,
        logp_trans=args.logp_trans, logp_rots=args.logp_rots,
        noise_scale=args.noise_scale, stochastic=args.stochastic,
        esm_rate=args.esm_rate,
    )
    _snapshot(args, args.out_dir)
    n = args.length
    feats0 = {
        "rigids_t": rigid.rigid_identity((1, n)),
        "res_mask": jax.numpy.ones((1, n)),
        "fixed_mask": jax.numpy.zeros((1, n)),
        "t": jax.numpy.ones((1,)),
        "seq_idx": jax.numpy.arange(n)[None],
        "sc_ca_t": jax.numpy.zeros((1, n, 3)),
    }
    model_a, sc_adapter_a = _build_protein_model(
        args.ckpt_a, IPAConfig.proteus_like, se3, feats0, jax.random.PRNGKey(1),
        struct2seq_opts={"mpnn_ckpt": args.mpnn_ckpt,
                         "esm_dir": args.esm_dir,
                         "seq_nums": args.seq_nums},
    )
    model_b, sc_adapter_b = _build_protein_model(
        args.ckpt_b, IPAConfig.framediff_like, se3, feats0, jax.random.PRNGKey(2)
    )

    # seed-series over lengths (reference protocol: 50 seeds x lengths
    # {100,150,200,250,300}, proteins/README.md:99)
    lengths = lengths_list or [n]
    for length in lengths:
        for seed in range(args.seed, args.seed + args.num_seeds):
            out_path = os.path.join(args.out_dir, f"len_{length}_seed_{seed}.pdb")
            if os.path.exists(out_path) and not args.overwrite:
                # idempotent skip-if-done resume (inference.py:187-189)
                print(f"skip existing {out_path}")
                continue
            # --batch > 1 runs B trajectories per seed-key in one compiled
            # program (batched scan); extra backbones get _k suffixes.
            out = compose(
                jax.random.PRNGKey(seed), model_a, model_b, se3,
                n_res=length, cfg=cfg, batch=args.batch,
                sc_adapter_a=sc_adapter_a, sc_adapter_b=sc_adapter_b,
            )
            tr = out["traces"]
            for b in range(args.batch):
                path_b = out_path if b == 0 else out_path.replace(".pdb", f"_{b}.pdb")
                pdb = backbone.to_pdb(np.asarray(out["atom37"][b]))
                with open(path_b, "w") as f:
                    f.write(pdb)
                print(json.dumps({
                    "length": length,
                    "seed": seed,
                    "batch_index": b,
                    "kappa_trans_last": float(np.asarray(tr["kappa_trans"])[-1, b]),
                    "ll_a_trans": float(np.asarray(tr["ll_a_trans"])[-1, b]),
                    "ll_b_trans": float(np.asarray(tr["ll_b_trans"])[-1, b]),
                    "pdb": path_b,
                }))


def _load_or_init(net, feats0, ckpt: str, key):
    if ckpt and os.path.exists(ckpt):
        import orbax.checkpoint as ocp

        return ocp.StandardCheckpointer().restore(ckpt)
    return net.init(key, feats0)["params"]


def _build_protein_model(ckpt, fallback_cfg_fn, se3, feats0, key,
                         struct2seq_opts=None):
    """Build a protein score model for composition; returns
    (model_fn, sc_adapter or None).

    Torch pickles (.pkl/.pth/.pt — the reference's checkpoint format with
    embedded conf, ``inference_se3_diffusion.py:130-159``) load into the
    weight-compatible nets: Proteus checkpoints are detected by their
    ``embedding_layer.template_embedder.*`` keys, FrameDiff otherwise.
    Orbax directories load this framework's own nets; no checkpoint gives a
    random init of the fallback config.

    ``struct2seq_opts`` ({mpnn_ckpt, esm_dir, seq_nums}) arms the MPNN+ESM
    sequence conditioner when the Proteus checkpoint config enables
    struct2seq (config.yaml:298-311); the composition's esm_rate
    sub-schedule then gates it per step through ``feats['struct2seq']``.
    """
    import jax
    import jax.numpy as jnp

    if ckpt and ckpt.endswith((".pkl", ".pth", ".pt")):
        if not os.path.exists(ckpt):
            raise SystemExit(f"checkpoint not found: {ckpt}")
        from .models.protein import convert as pconvert
        from .models.protein import rigid as prigid

        sd, conf = pconvert.load_torch_checkpoint(ckpt)
        is_proteus = any(
            k.startswith("embedding_layer.template_embedder") for k in sd
        )
        mc = conf.get("model", {}) if isinstance(conf, dict) else {}
        if is_proteus:
            from .models.protein.proteus import ProteusConfig, ProteusScoreNetwork

            cfg = ProteusConfig.from_ckpt_conf(mc) if mc else ProteusConfig()
            s2s_fn = None
            if cfg.struct2seq_enable:
                from .models.protein import struct2seq as s2smod

                opts = struct2seq_opts or {}
                esm_sd = esm_cfg = None
                if opts.get("esm_dir"):
                    esm_sd, esm_cfg = pconvert.load_esm2_snapshot(
                        opts["esm_dir"]
                    )
                mmodel, mparams = s2smod.load_mpnn_esm(
                    sd, c_s=cfg.node_embed_size, c_z=cfg.edge_embed_size,
                    mpnn_ckpt=opts.get("mpnn_ckpt"), esm_sd=esm_sd,
                    esm_cfg=esm_cfg, seq_nums=opts.get("seq_nums", 4),
                )
                s2s_fn = s2smod.make_struct2seq_fn(mmodel, mparams)
            net = ProteusScoreNetwork(cfg, struct2seq_fn=s2s_fn)
            b, n = feats0["res_mask"].shape

            def pfeats(feats):
                bb, nn_ = feats["res_mask"].shape
                return {
                    # init_feat defaults (fold_module.py:551+): ALA sequence,
                    # ss/adjacency/hotspot mask categories, zero torsions
                    "aatype": jnp.zeros((bb, nn_), jnp.int32),
                    "residue_index": feats["seq_idx"].astype(jnp.int32),
                    "chain_index": jnp.zeros((bb, nn_), jnp.int32),
                    "res_mask": feats["res_mask"],
                    "fixed_mask": feats["fixed_mask"],
                    "rigids_t": feats["rigids_t"],
                    "t": feats["t"],
                    "ss": jax.nn.one_hot(jnp.full((bb, nn_), 3), 4),
                    "adjacency": jax.nn.one_hot(jnp.full((bb, nn_, nn_), 2), 3),
                    "hotspot": jax.nn.one_hot(jnp.zeros((bb, nn_), jnp.int32), 2),
                    "torsion_angles_sin_cos": jnp.zeros((bb, nn_, 7, 2)),
                }

            # init with the gate armed so the cross-embedder params exist
            arm_s2s = s2s_fn is not None
            params = jax.jit(
                lambda k, f: net.init(k, f, struct2seq=arm_s2s)
            )(key, pfeats(feats0))["params"]
            params, n_applied = pconvert.apply_proteus_state_dict(params, sd, cfg)
            print(f"loaded Proteus checkpoint {ckpt}: {n_applied} tensors")

            def model(feats, t):
                out = net.apply(
                    {"params": params}, pfeats(feats),
                    self_condition=feats.get("self_cond"),
                    struct2seq=feats.get("struct2seq", False),
                )
                rigids_t = feats["rigids_t"]
                # ScoreWrapper conversion (composition.py:45-94)
                out["rot_score"] = se3.calc_rot_score(
                    prigid.rigid_rotmat(rigids_t), out["pred_rotmats"],
                    feats["t"][:, None],
                )
                out["trans_score"] = se3.calc_trans_score(
                    prigid.rigid_trans(rigids_t), out["pred_trans"],
                    feats["t"][:, None, None],
                )
                return out

            def sc_init(init_rigids):
                bb, nn_ = init_rigids.shape[:2]
                return {
                    "final_atom_positions": jnp.zeros((bb, nn_, 37, 3)),
                    "final_atom_mask": jnp.zeros((bb, nn_, 37)),
                    "active": jnp.float32(0.0),
                }

            def sc_update(out):
                return {
                    "final_atom_positions": out["final_atom_positions"],
                    "final_atom_mask": out["final_atom_mask"],
                    "active": jnp.float32(1.0),
                }

            return model, (sc_init, sc_update)

        from .models.protein.framediff import FrameDiffConfig, FrameDiffScoreNetwork

        cfg = FrameDiffConfig.from_ckpt_conf(mc) if mc else FrameDiffConfig()
        net = FrameDiffScoreNetwork(cfg, score_calc=se3)
        params = jax.jit(net.init)(key, feats0)["params"]
        params, n_applied = pconvert.apply_framediff_state_dict(params, sd, cfg)
        print(f"loaded FrameDiff checkpoint {ckpt}: {n_applied} tensors")

        def model(feats, t):
            return net.apply({"params": params}, feats)

        return model, None

    from .models.protein import IPAConfig, IPAScoreNetwork  # noqa: F811

    net = IPAScoreNetwork(fallback_cfg_fn(), se3)
    params = _load_or_init(net, feats0, ckpt, key)

    def model(feats, t):
        return net.apply({"params": params}, feats)

    return model, None


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="superdiff_tpu")
    # multi-host: same entry point on every process of a slice (the
    # reference's LOCAL_RANK / process_index plumbing, SURVEY.md §5.8);
    # defaults are no-ops on single-process runs.
    p.add_argument("--coordinator_address", default=None,
                   help="host:port of process 0 for jax.distributed")
    p.add_argument("--num_processes", type=int, default=None)
    p.add_argument("--process_id", type=int, default=None)
    p.add_argument("--platform", default=None, choices=["cpu", "tpu"],
                   help="force the jax platform in-process before any "
                   "device use (the JAX_PLATFORMS env var is overridden "
                   "by pinned platform plugins on some images; this flag "
                   "is the reliable way to smoke-run without a chip)")
    sub = p.add_subparsers(dest="cmd", required=True)

    c = sub.add_parser("cifar", help="CIFAR train/eval (cifar/main.py modes)")
    c.add_argument("--mode", required=True,
                   choices=["train", "eval_fid", "eval_joint_fid", "fid_stats"])
    c.add_argument("--config", default="vpsde", choices=["vpsde", "vpsdeA", "vpsdeB", "vpsde_less_5", "vpsde_more_5"])
    c.add_argument("--workdir", default="./runs/cifar")
    c.add_argument("--chkpts", default="", help="comma-separated checkpoint dirs for joint eval")
    c.add_argument("--stoch", action="store_true")
    c.add_argument("--n_iters", type=int, default=None)
    c.add_argument("--batch_size", type=int, default=None)
    c.add_argument("--stats_path", default=None)
    c.add_argument("--inception_weights", default=None)
    c.set_defaults(fn=cmd_cifar)

    s = sub.add_parser("sd", help="Stable-Diffusion composition (clip_eval.py)")
    s.add_argument("--method", default="and", choices=list(__import__(
        "superdiff_tpu.pipelines.sd", fromlist=["METHODS"]).METHODS))
    s.add_argument("--obj", default="a cat")
    s.add_argument("--bg", default="a dog")
    s.add_argument("--num_inference_steps", type=int, default=1000)
    s.add_argument("--seed", type=int, default=1)
    s.add_argument("--batch_size", type=int, default=6)
    s.add_argument("--height", type=int, default=512)
    s.add_argument("--width", type=int, default=512)
    s.add_argument("--T", type=float, default=1.0)
    s.add_argument("--logp", type=float, default=0.0)
    s.add_argument("--lift", type=float, default=0.0)
    s.add_argument("--guidance_scale", type=float, default=7.5)
    s.add_argument("--weights_dir", default=None)
    s.add_argument("--preset", default="sd15", choices=["sd15", "tiny"],
                   help="tiny = 1/16-width stack for smoke runs without weights")
    s.add_argument("--out_dir", default="./runs/sd")
    s.set_defaults(fn=cmd_sd)

    pr = sub.add_parser("protein", help="SE(3) composition (superdiff/inference.py)")
    pr.add_argument("--length", type=int, default=100)
    pr.add_argument("--lengths", default=None,
                    help="comma list for a series run, e.g. 100,150,200,250,300")
    pr.add_argument("--num_t", type=int, default=500)
    pr.add_argument("--min_t", type=float, default=0.002)
    pr.add_argument("--mixing_method", default="composition",
                    choices=["composition", "mixture", "baseline_a", "baseline_b"])
    pr.add_argument("--operator", default="OR", choices=["OR", "AND"])
    pr.add_argument("--temp_trans", type=float, default=1.0)
    pr.add_argument("--temp_rots", type=float, default=1.0)
    pr.add_argument("--logp_trans", type=float, default=0.0)
    pr.add_argument("--logp_rots", type=float, default=0.0)
    pr.add_argument("--noise_scale", type=float, default=0.1)
    pr.add_argument("--stochastic", action="store_true")
    pr.add_argument("--seed", type=int, default=0)
    pr.add_argument("--num_seeds", type=int, default=1)
    pr.add_argument("--batch", type=int, default=1, help="trajectories per seed-key, one compiled batched scan")
    pr.add_argument("--ckpt_a", default=None)
    pr.add_argument("--ckpt_b", default=None)
    pr.add_argument("--esm_rate", type=float, default=0.0,
                    help="fraction of steps with struct2seq/ESM conditioning "
                    "on the proteus-role model (composition.py:184-187)")
    pr.add_argument("--mpnn_ckpt", default=None,
                    help="ProteinMPNN CA weights file (v_48_020.pt) for "
                    "struct2seq")
    pr.add_argument("--esm_dir", default=None,
                    help="local transformers ESM2 snapshot dir for struct2seq")
    pr.add_argument("--seq_nums", type=int, default=4,
                    help="sequences sampled per struct2seq call "
                    "(strcture2seq.py:29)")
    pr.add_argument("--overwrite", action="store_true")
    pr.add_argument("--out_dir", default="./runs/protein")
    pr.set_defaults(fn=cmd_protein)
    return p


def main(argv=None):
    from .utils.cache import enable_compilation_cache

    enable_compilation_cache()
    args = build_parser().parse_args(argv)
    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)
    if args.coordinator_address or args.num_processes:
        from .parallel.distributed import initialize

        initialize(
            coordinator_address=args.coordinator_address,
            num_processes=args.num_processes,
            process_id=args.process_id,
        )
    args.fn(args)


if __name__ == "__main__":
    main()
