"""Batch launcher for the 20 concept-pair SD composition experiments.

Script equivalent of ``applications/images/clip_eval.sh``: the paper's 20
(object, background) prompt pairs x methods, dispatched through the unified
CLI. Indices select a pair and a method, matching the reference's
task-array launch pattern.

  python scripts/run_sd_prompts.py --pair 0 --method and --steps 1000
  python scripts/run_sd_prompts.py --all-methods --pair 3
"""

import argparse
import subprocess
import sys

# the paper's 20 concept pairs (clip_eval.sh OBJ_VALUES/BG_VALUES)
PAIRS = [
    ("a mountain landscape", "silhouette of a dog"),
    ("a flamingo", "a candy cane"),
    ("a dragonfly", "a helicopter"),
    ("dandelion", "fireworks"),
    ("a sunflower", "a lemon"),
    ("a rocket", "a cactus"),
    ("moon", "cookie"),
    ("a snail", "a cinnamon roll"),
    ("an eagle", "an airplane"),
    ("zebra", "barcode"),
    ("chess pawn", "bottle cap"),
    ("a pineapple", "a beehive"),
    ("a spider web", "a bicycle wheel"),
    ("a waffle cone", "a volcano"),
    ("a cat", "a dog"),
    ("a chair", "an avocado"),
    ("a donut", "a map"),
    ("otter", "duck"),
    ("pebbles on a beach", "a turtle"),
    ("teddy bear", "panda"),
]

METHODS = ["and", "avg", "sd_ab", "sd_ba", "or", "sd_ab_or", "sd_ba_or", "sd_a", "sd_b"]


def main():
    from superdiff_tpu.utils.tunnel import require_tunnel

    require_tunnel('run_sd_prompts')
    ap = argparse.ArgumentParser()
    ap.add_argument("--pair", type=int, default=0, help="pair index 0..19")
    ap.add_argument("--method", default="and", choices=METHODS)
    ap.add_argument("--all-methods", action="store_true")
    ap.add_argument("--steps", type=int, default=1000)
    ap.add_argument("--seed", type=int, default=1)
    ap.add_argument("--batch_size", type=int, default=1)
    ap.add_argument("--out_dir", default="./runs/sd")
    ap.add_argument("--weights_dir", default=None)
    args = ap.parse_args()

    obj, bg = PAIRS[args.pair]
    methods = METHODS if args.all_methods else [args.method]
    for method in methods:
        cmd = [
            sys.executable, "-m", "superdiff_tpu.cli", "sd",
            "--method", method, "--obj", obj, "--bg", bg,
            "--num_inference_steps", str(args.steps),
            "--seed", str(args.seed),
            "--batch_size", str(args.batch_size),
            "--out_dir", args.out_dir,
        ]
        if args.weights_dir:
            cmd += ["--weights_dir", args.weights_dir]
        print("+", " ".join(cmd), flush=True)
        subprocess.run(cmd, check=True)


if __name__ == "__main__":
    main()
