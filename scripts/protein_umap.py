"""Structure-embedding figure over generated backbone directories — the
executable form of the reference's ``visualization/protein_umap.ipynb``.

Point it at the per-model output dirs written by ``python -m
superdiff_tpu.cli protein`` (``len_{L}_seed_{S}.pdb`` files); it computes
the all-vs-all TM affinity on device (or via foldseek when installed and
--foldseek is passed), embeds it (umap if installed, else spectral), and
writes the scatter colored by model.

  python scripts/protein_umap.py --out umap.png \
      Proteus=/runs/proteus FrameDiff=/runs/framediff "SuperDiff (OR)"=/runs/or
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def load_dir(path, max_files=None):
    from superdiff_tpu.data.pdb import parse_pdb
    from superdiff_tpu.models.protein import residue_constants as rc

    coords = []
    names = sorted(f for f in os.listdir(path) if f.endswith(".pdb"))
    if max_files:
        names = names[:max_files]
    for nm in names:
        prot = parse_pdb(os.path.join(path, nm))
        coords.append(np.asarray(prot.atom37[:, rc.CA_IDX], np.float32))
    return coords


def main():
    from superdiff_tpu.utils.tunnel import require_tunnel

    require_tunnel('protein_umap')
    ap = argparse.ArgumentParser()
    ap.add_argument("dirs", nargs="+", help="NAME=PATH per model")
    ap.add_argument("--out", default="protein_umap.png")
    ap.add_argument("--method", default="auto",
                    choices=["auto", "umap", "spectral", "numpy"])
    ap.add_argument("--max_per_model", type=int, default=None)
    ap.add_argument("--foldseek", action="store_true",
                    help="use foldseek easy-search for the affinity "
                         "(requires equal layout + the binary; notebook-exact)")
    args = ap.parse_args()

    from superdiff_tpu.eval import embed_viz

    samples = {}
    for spec in args.dirs:
        name, _, path = spec.partition("=")
        if not path:
            ap.error(f"expected NAME=PATH, got {spec!r}")
        samples[name] = load_dir(path, args.max_per_model)
        print(f"[umap] {name}: {len(samples[name])} backbones", file=sys.stderr)

    if args.foldseek:
        import shutil
        import tempfile

        with tempfile.TemporaryDirectory() as tmp:
            labels = []
            for name, path in ((s.partition("=")[0], s.partition("=")[2]) for s in args.dirs):
                for nm in sorted(os.listdir(path)):
                    if nm.endswith(".pdb"):
                        shutil.copy(os.path.join(path, nm), os.path.join(tmp, f"{name}__{nm}"))
                        labels.append(name)
            got = embed_viz.foldseek_affinity(tmp)
            if got is None:
                print("[umap] foldseek unavailable; falling back to on-device TM",
                      file=sys.stderr)
            else:
                A, names = got
                labels = [n.split("__")[0] for n in names]
                xy = embed_viz.embed_2d(A, method=args.method)
                embed_viz.plot_embedding(xy, labels, args.out)
                print(f"[umap] wrote {args.out} ({len(labels)} structures)")
                return

    res = embed_viz.structure_map(samples, out_png=args.out, method=args.method)
    print(f"[umap] wrote {args.out} ({len(res['labels'])} structures)")


if __name__ == "__main__":
    main()
