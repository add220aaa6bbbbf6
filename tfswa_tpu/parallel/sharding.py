"""Sharding rules: parameter / batch partition specs over the mesh.

Megatron-style tensor parallelism for the attention blocks, expressed purely
as GSPMD sharding annotations (XLA inserts the all-reduces):
  - qkv_kernel (C, 3C)     -> (None, 'model')   column-parallel
  - proj_kernel (C, C)     -> ('model', None)   row-parallel
  - fc1_kernel (C, 4C)     -> (None, 'model')   column-parallel
  - fc1_bias  (4C,)        -> ('model',)
  - fc2_kernel (4C, C)     -> ('model', None)   row-parallel
  - everything else (convs, norms, biases, BN stats) replicated.

The batch is sharded over 'data'.  At the reference model's 15.4M params this
TP is optional; the rules exist so larger dims/depths configs scale without
code changes.
"""
from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

_TP_RULES = {
    "qkv_kernel": P(None, "model"),
    "fc1_kernel": P(None, "model"),
    "fc1_bias": P("model"),
    "proj_kernel": P("model", None),
    "fc2_kernel": P("model", None),
}


def param_spec(path: Tuple, leaf: Any, tensor_parallel: bool = True) -> P:
    """PartitionSpec for one parameter, keyed on its leaf name."""
    name = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
    if tensor_parallel and name in _TP_RULES:
        return _TP_RULES[name]
    return P()


def variables_shardings(
    variables: Dict, mesh: Mesh, tensor_parallel: bool = True
) -> Dict:
    """NamedSharding tree matching a {'params', 'batch_stats', ...} tree."""

    def to_sharding(path, leaf):
        return NamedSharding(mesh, param_spec(path, leaf, tensor_parallel))

    return jax.tree_util.tree_map_with_path(to_sharding, variables)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) dim over 'data'."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_variables(variables: Dict, mesh: Mesh, tensor_parallel: bool = True) -> Dict:
    """Place a variables tree onto the mesh according to the rules."""
    shardings = variables_shardings(variables, mesh, tensor_parallel)
    return jax.device_put(variables, shardings)


def shard_batch(batch, mesh: Mesh):
    """Place (pytree of) host arrays onto the mesh, batch-dim over 'data'."""
    sharding = batch_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), batch)
