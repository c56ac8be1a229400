"""Reference CIFAR ScoreNet checkpoint -> ScoreUNet param tree.

The reference CIFAR stack is Flax (``cifar/models/ddpm.py``); its trained
checkpoints (orbax/flax ``State.params_ema``) convert to :class:`ScoreUNet`
by pure path rewriting — the two nets are architecturally isomorphic and
numerically parity-tested (``tests/test_cifar_unet_parity.py``, 2e-4 over
the full forward, conditioned and unconditioned).

Type renames (module creation order is identical on both sides, so flax's
per-type auto-numbering lines up):

    ResnetBlockDDPM_i -> ResnetBlock_i
    GroupNorm_k       -> GroupNorm32_k/GroupNorm_0
    AttnBlock NIN_k   -> Dense_k            (leaves W/b -> kernel/bias)
    Resnet NIN_0      -> Dense_1  (shortcut; Dense_0 is the temb proj)
"""

from __future__ import annotations

from typing import Any, Dict

import jax


def convert_scorenet_params(ref_params: Any) -> Dict:
    """Rewrite a reference ``ScoreNet`` param tree into ScoreUNet's layout."""
    flat = jax.tree_util.tree_flatten_with_path(ref_params)[0]
    out: Dict = {}
    for keypath, leaf in flat:
        toks = [getattr(k, "key", str(k)) for k in keypath]
        new = []
        in_resnet = False
        for tok in toks:
            if tok.startswith("ResnetBlockDDPM_"):
                in_resnet = True
                new.append(tok.replace("ResnetBlockDDPM_", "ResnetBlock_"))
            elif tok.startswith("GroupNorm_"):
                new.extend([tok.replace("GroupNorm_", "GroupNorm32_"),
                            "GroupNorm_0"])
            elif tok.startswith("NIN_"):
                idx = int(tok.split("_")[1])
                new.append(f"Dense_{idx + 1}" if in_resnet else f"Dense_{idx}")
            elif tok == "W":
                new.append("kernel")
            elif tok == "b":
                new.append("bias")
            else:
                new.append(tok)
        node = out
        for tok in new[:-1]:
            node = node.setdefault(tok, {})
        node[new[-1]] = leaf
    return out
