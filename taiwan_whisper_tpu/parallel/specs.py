"""PartitionSpec trees for Whisper params — the tensor-parallel layout.

Replaces T5X's `param_with_axes` annotation machinery (reference:
training/flax/distil_whisper/layers.py + partitioner.py:487-571 logical
rules) with one pattern-matcher over param paths. The layout it encodes is
the same 2-D ("data", "model") sharding: attention QKV/out and MLP kernels
split over the model axis (megatron-style: column-parallel then
row-parallel), vocab embedding split over model; norms, convs and positional
tables replicated.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import MODEL_AXIS

# (path suffix) -> PartitionSpec for the unstacked parameter
_RULES = [
    (("self_attn", "q", "kernel"), P(None, MODEL_AXIS)),
    (("self_attn", "k", "kernel"), P(None, MODEL_AXIS)),
    (("self_attn", "v", "kernel"), P(None, MODEL_AXIS)),
    (("self_attn", "out", "kernel"), P(MODEL_AXIS, None)),
    (("self_attn", "q", "bias"), P(MODEL_AXIS)),
    (("self_attn", "k", "bias"), P(MODEL_AXIS)),
    (("self_attn", "v", "bias"), P(MODEL_AXIS)),
    (("cross_attn", "q", "kernel"), P(None, MODEL_AXIS)),
    (("cross_attn", "k", "kernel"), P(None, MODEL_AXIS)),
    (("cross_attn", "v", "kernel"), P(None, MODEL_AXIS)),
    (("cross_attn", "out", "kernel"), P(MODEL_AXIS, None)),
    (("cross_attn", "q", "bias"), P(MODEL_AXIS)),
    (("cross_attn", "k", "bias"), P(MODEL_AXIS)),
    (("cross_attn", "v", "bias"), P(MODEL_AXIS)),
    (("fc1", "kernel"), P(None, MODEL_AXIS)),
    (("fc1", "bias"), P(MODEL_AXIS)),
    (("fc2", "kernel"), P(MODEL_AXIS, None)),
    # NB: embed_tokens stays replicated — Whisper's vocab (51865 = 5*11*23*41)
    # is not divisible by any practical model-axis size, and the table is
    # ~130 MB bf16 for large-v2 vs ~3 GB of (sharded) layer weights, so
    # replication costs little HBM while avoiding padded-vocab logits.
]


def _path_names(path) -> tuple:
    names = []
    for k in path:
        if isinstance(k, jax.tree_util.DictKey):
            names.append(k.key)
        elif isinstance(k, jax.tree_util.SequenceKey):
            names.append(k.idx)
        else:
            names.append(str(k))
    return tuple(names)


def _spec_for(path_names: tuple, ndim: int) -> P:
    in_layer_stack = "layers" in path_names
    for suffix, spec in _RULES:
        if path_names[-len(suffix):] == suffix:
            if in_layer_stack:
                return P(None, *spec)  # leading stacked-layer axis
            return spec
    return P()  # replicated


def param_partition_specs(params: Dict[str, Any]):
    """Pytree of PartitionSpec matching `params` structure."""
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: _spec_for(_path_names(path), leaf.ndim), params
    )


def param_shardings(mesh: Mesh, params: Dict[str, Any]):
    """Pytree of NamedSharding for placing params on `mesh`."""
    specs = param_partition_specs(params)
    return jax.tree.map(lambda s: NamedSharding(mesh, s), specs,
                        is_leaf=lambda x: isinstance(x, P))


def shard_params(mesh: Mesh, params: Dict[str, Any]):
    """Device-put params onto the mesh with the TP layout."""
    return jax.device_put(params, param_shardings(mesh, params))
