"""Tensor-parallel sharding of the LLaMA subject model.

The reference never shards the subject model in-framework — the 8B LLaVA fits
on one A100, and the explainer LLMs are delegated to sglang's
`--tensor-parallel-size` (reference clients/sglang.py:33-34).  On TPU v5e
(16 GB HBM/chip) an 8B bf16 model plus activations does NOT fit on one chip,
so the subject model itself needs megatron-style TP over the ICI mesh.

With pjit this is purely a placement problem: q/k/v/gate/up projections are
column-sharded, o/down row-sharded, the lm_head vocab-sharded, and XLA
inserts the all-reduces where row-sharded matmuls meet the replicated
residual stream.  The EMBEDDING is deliberately replicated (P(None, None),
~1.05 GB bf16 at 8B): a vocab-sharded table turns every token lookup into a
cross-chip gather/psum on the critical path, and a hidden-sharded table
would shard the residual stream the rest of the placement keeps replicated
— the HBM cost buys a collective-free embed.  `shard_llama_params` applies
the placement; any jitted forward over these params then runs tensor-parallel
with no code changes to the model.
"""

from __future__ import annotations

from typing import Dict

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def llama_param_specs(axis: str = "model") -> Dict[str, P]:
    """PartitionSpec per layer-parameter name (weights stored (in, out))."""
    return {
        # column parallel: output dim sharded
        "q_proj": P(None, axis),
        "k_proj": P(None, axis),
        "v_proj": P(None, axis),
        "gate_proj": P(None, axis),
        "up_proj": P(None, axis),
        # row parallel: input dim sharded (XLA all-reduces the partial sums)
        "o_proj": P(axis, None),
        "down_proj": P(axis, None),
        # norms replicated
        "input_layernorm": P(),
        "post_attention_layernorm": P(),
    }


def shard_llama_params(params: dict, mesh: Mesh, axis: str = "model") -> dict:
    """Place LLaMA params tensor-parallel on `mesh`. Returns a new tree of
    device arrays; the functional forward (models/llama.py) runs unchanged.
    Handles both layer layouts: per-layer dict lists, and stacked arrays with
    a leading layer dim (models/llama.py stack_layer_params)."""
    specs = llama_param_specs(axis)

    def put(x, spec):
        if isinstance(x, dict) and "q8" in x:
            # int8-quantized weight (models/quant.py): the q8 matrix shards
            # like the dense weight; the per-output-channel scale follows the
            # output dim — sharded for column-parallel, replicated for
            # row-parallel (where outputs are full-size partial sums).
            # scale (..., out): drop the input dim of the matrix spec, keep
            # any leading (stacked-layer) dims.
            scale_spec = P(*spec[:-2], spec[-1]) if len(spec) >= 2 else P()
            return {
                "q8": jax.device_put(x["q8"], NamedSharding(mesh, spec)),
                "scale": jax.device_put(x["scale"], NamedSharding(mesh, scale_spec)),
            }
        return jax.device_put(x, NamedSharding(mesh, spec))

    layers = params["layers"]
    if isinstance(layers, dict):  # stacked: prepend the layer dim
        sharded_layers = {
            name: put(w, P(None, *specs[name])) for name, w in layers.items()
        }
    else:
        sharded_layers = [
            {name: put(w, specs[name]) for name, w in layer.items()}
            for layer in layers
        ]
    out = {
        "embed_tokens": put(params["embed_tokens"], P(None, None)),
        "norm": put(params["norm"], P()),
        "layers": sharded_layers,
    }
    if "lm_head" in params:
        out["lm_head"] = put(params["lm_head"], P(None, axis))
    return out


def replicate_on_mesh(tree, mesh: Mesh):
    """Place every leaf fully replicated on `mesh` — for components that ride
    along with a TP subject without being sharded themselves (vision tower,
    projector, SAE params): jit rejects inputs living on different device
    sets, so everything the TP forward touches must live on the TP mesh."""
    repl = NamedSharding(mesh, P())

    def put(x):
        return jax.device_put(x, repl) if hasattr(x, "shape") else x

    return jax.tree_util.tree_map(put, tree)


def replicate_saes(model, saes) -> None:
    """Replicate every SAE's params onto a TP subject's mesh, in place.

    The shared epilogue of every launch CLI that pairs SAEs with a possibly
    tensor-parallel subject (cache, cache_image, attribution, steering): a
    no-op for single-device subjects (`model.mesh is None`)."""
    mesh = getattr(model, "mesh", None)
    if mesh is None:
        return
    for sae in saes:
        sae.params = replicate_on_mesh(sae.params, mesh)


def shard_subject_model(model, tp: int, axis: str = "model"):
    """Wire `--tp N` from a launch CLI: build a ('model',) mesh over the
    first `tp` local devices and place the subject tensor-parallel —
    megatron-sharded LLaMA weights, replicated vision tower/projector for
    LLaVA.  Any jitted forward over the returned model runs TP with no code
    changes (pjit placement-only design; the reference delegated its only TP
    to sglang's --tensor-parallel-size, reference clients/sglang.py:33-34).

    Returns (model, mesh)."""
    from .mesh import get_mesh

    # local_devices, not jax.devices(): in a multi-process run the global
    # list leads with host 0's chips on every rank, and device_put onto
    # another host's (non-addressable) devices crashes. Each process TPs
    # its subject over its own chips; cross-process remains data/feature
    # parallel, matching the launch scripts' process-index sharding.
    devices = jax.local_devices()
    if tp > len(devices):
        raise ValueError(f"--tp {tp} > local devices ({len(devices)})")
    mesh = get_mesh((axis,), devices=devices[:tp])
    params = model.params
    if "language_model" in params:  # LLaVA-NeXT
        params = dict(params)
        params["language_model"] = shard_llama_params(
            params["language_model"], mesh, axis
        )
        for key in ("vision_tower", "projector", "image_newline"):
            if key in params:
                params[key] = replicate_on_mesh(params[key], mesh)
        model.params = params
    else:
        model.params = shard_llama_params(params, mesh, axis)
    model.mesh = mesh
    return model, mesh
