"""Tensor-parallel Stable-Diffusion UNet inference over a device mesh.

Beyond the reference's parallelism story (the reference runs SD inference on
one GPU, data-parallel at most): shard the transformer tier of the SD UNet
over a ``tp`` mesh axis so one latent's forward spans several chips —
attention projections column-sharded over heads, the attention output
row-sharded, the GEGLU FFN column/row-sharded over its hidden dim — while
the conv tier stays replicated (its weights are reused across the batch
that the ``data`` axis already splits). XLA GSPMD inserts the collectives.
Measured from the compiled HLO on an 8-device (data=2, tp=4) mesh
(``tests/test_tp.py::test_tp_collective_counts`` pins this): each
transformer block costs exactly **4 activation-sized all-reduces** (after
the row-parallel ``attn1/to_out``, ``attn2/to_out``, ``ff_out``,
``proj_out``) plus **3 activation-sized all-gathers** (GSPMD keeps the
residual stream channel-sharded, computes each pre-LayerNorm shard-local,
and gathers the normalized (M, C) stream once before each of
attn1/attn2/ffn) — and no other collective, all riding ICI. Getting here
required layouts to cooperate: the packed qkv/kv projections and the
packed (value|gate) GEGLU weight each forced GSPMD reshards (7
collective-permutes per self-attention; a full (M, 2F) all-gather of the
FFN hidden — both measured before the fix), so the einsum lowering
unpacks qkv and the GEGLU kernel is stored value/gate-STACKED as
(C, 2, F) (``models/sd/unet._GEGLUProjParams``) so a last-axis shard
keeps each device's value/gate slices aligned.

Works on the **einsum lowering** (``SDUNetConfig(attn_impl='einsum',
ffn_impl='einsum')``): GSPMD propagates through plain dots/einsums; the
Pallas kernels are single-chip programs (a sharded operand would force an
all-gather at the custom-call boundary), so multi-chip TP uses the XLA
path and single-chip throughput uses the kernels — selected per run by the
same config flag.

Head-count divisibility: SD-1.x has 8 attention heads; tp in {2, 4, 8}
keeps head groups whole. The GEGLU hidden axis F = 4C (C a multiple of
64) is divisible by tp as well.
"""

from __future__ import annotations

import re
from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


# (path regex, PartitionSpec) — first match wins; kernels only (biases and
# norm scales are tiny, replicated).
_TP_RULES = (
    # attention: column-parallel qkv (shards heads), row-parallel out
    (re.compile(r"attn\d/to_[qkv]/kernel$"), P(None, "tp")),
    (re.compile(r"attn\d/to_out/kernel$"), P("tp", None)),
    # GEGLU FFN: column-parallel in-projection (kernel is (C, 2, F),
    # value/gate stacked on axis 1 — shard the hidden F axis so each
    # device's value/gate slices stay aligned), row-parallel out-projection
    (re.compile(r"ff_geglu/proj/kernel$"), P(None, None, "tp")),
    (re.compile(r"ff_out/kernel$"), P("tp", None)),
    # per-token projections around the transformer stack
    (re.compile(r"proj_in/kernel$"), P(None, "tp")),
    (re.compile(r"proj_out/kernel$"), P("tp", None)),
)


def _shardings_from_rules(params: Any, mesh: Mesh, prefix: tuple) -> Any:
    """Rule-matched NamedSharding pytree; ``prefix`` is prepended to every
    spec (and to the replicated default) so the same Megatron pairing also
    serves ensemble-STACKED param trees whose leaves carry a leading model
    axis."""
    assert "tp" in mesh.axis_names, mesh.axis_names
    replicated = NamedSharding(mesh, P(*prefix))

    def spec_for(path: str, leaf) -> NamedSharding:
        for rx, spec in _TP_RULES:
            if rx.search(path):
                # only shard when the dimension divides evenly
                tp = mesh.shape["tp"]
                dim = [i for i, s in enumerate(spec) if s == "tp"][0]
                if leaf.shape[dim + len(prefix)] % tp == 0:
                    return NamedSharding(mesh, P(*prefix, *spec))
                return replicated
        return replicated

    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    treedef = jax.tree_util.tree_structure(params)
    out = []
    for keypath, leaf in flat:
        path = "/".join(
            getattr(k, "key", getattr(k, "name", str(k))) for k in keypath
        )
        out.append(spec_for(path, leaf))
    return jax.tree_util.tree_unflatten(treedef, out)


def sd_tp_shardings(params: Any, mesh: Mesh) -> Any:
    """A NamedSharding pytree for SD UNet params: transformer kernels
    sharded over the mesh's ``tp`` axis per the Megatron pairing above,
    everything else replicated."""
    return _shardings_from_rules(params, mesh, prefix=())


def sd_tp_shardings_stacked(stacked_params: Any, mesh: Mesh) -> Any:
    """Shardings for an ensemble-STACKED SD UNet tree (leading model axis,
    ``models.stack_params``): the stack axis shards over ``model`` and each
    kernel's tp rule shifts one dim right — full 3-axis
    data x model x tp composition, each denoiser's tensor shards living on
    its own model-group's chips."""
    assert "model" in mesh.axis_names, mesh.axis_names
    return _shardings_from_rules(stacked_params, mesh, prefix=("model",))


def place_tp(params: Any, mesh: Mesh) -> Any:
    """Device-put the param tree with :func:`sd_tp_shardings`."""
    shardings = sd_tp_shardings(params, mesh)
    return jax.tree.map(jax.device_put, params, shardings)


def make_tp_mesh(data: int, tp: int) -> Mesh:
    """A ('data', 'tp') mesh; tp innermost so a latent's tensor shards sit
    on neighboring chips (TP collectives are per-step, DP has none at
    inference)."""
    import numpy as np

    devs = np.asarray(jax.devices()[: data * tp]).reshape(data, tp)
    return Mesh(devs, ("data", "tp"))


def make_ensemble_tp_mesh(data: int, model: int, tp: int) -> Mesh:
    """A ('data', 'model', 'tp') mesh for composed-ensemble TP inference:
    tp innermost (per-step collectives on neighbors), the ensemble axis in
    the middle (per-step activation mixing), data outermost (no inference
    collectives)."""
    import numpy as np

    devs = np.asarray(jax.devices()[: data * model * tp]).reshape(
        data, model, tp
    )
    return Mesh(devs, ("data", "model", "tp"))
