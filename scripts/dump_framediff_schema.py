"""Regenerate tests/fixtures/framediff_state_dict_schema.json.

Instantiates the REFERENCE torch ScoreNetwork (read-only from
/root/reference, missing third-party deps stubbed) with its shipped base
config and records the exact state_dict key -> shape schema the published
FrameDiff checkpoints follow (``inference_se3_diffusion.py:130-159`` load
path). The converter test pins its mapping against this fixture.
"""

import json
import re
import sys
import types

import yaml

REFERENCE = "/root/reference/applications/proteins/se3_diffusion"
OUT = "tests/fixtures/framediff_state_dict_schema.json"


class _Stub(types.ModuleType):
    __path__ = []

    def __getattr__(self, name):
        if name.startswith("__"):
            raise AttributeError(name)
        full = self.__name__ + "." + name
        sub = _Stub(full)
        sys.modules.setdefault(full, sub)
        return sub


def resolve(node, root):
    if isinstance(node, dict):
        return {k: resolve(v, root) for k, v in node.items()}
    if isinstance(node, list):
        return [resolve(v, root) for v in node]
    if isinstance(node, str):
        m = re.fullmatch(r"\$\{([\w.]+)\}", node)
        if m:
            cur = root
            for part in m.group(1).split("."):
                cur = cur[part]
            return resolve(cur, root)
    return node


def main():
    for m in ("omegaconf", "Bio", "Bio.PDB", "Bio.PDB.Chain", "mdtraj", "GPUtil",
              "hydra", "wandb", "esm", "pytorch3d", "pytorch3d.transforms"):
        sys.modules.setdefault(m, _Stub(m))
    sys.path.insert(0, REFERENCE)
    import ml_collections

    from se3diff_model import score_network

    root = yaml.safe_load(open(f"{REFERENCE}/config/base.yaml"))
    model_conf_d = resolve(root["model"], root)
    net = score_network.ScoreNetwork(
        ml_collections.ConfigDict(model_conf_d), diffuser=None
    )
    schema = {k: list(v.shape) for k, v in net.state_dict().items()}
    json.dump({"model_conf": model_conf_d, "schema": schema}, open(OUT, "w"), indent=1)
    print(f"wrote {OUT}: {len(schema)} tensors")


if __name__ == "__main__":
    main()
