"""SPMD parallelism: mesh construction and GSPMD sharding rules."""
from .analysis import (
    analyze_jitted,
    collective_stats,
    compiled_flops,
    ring_all_reduce_link_bytes,
)
from .mesh import create_mesh, mesh_from_config
from .sharding import (
    batch_sharding,
    param_spec,
    replicated,
    shard_batch,
    shard_variables,
    variables_shardings,
)

__all__ = [
    "analyze_jitted",
    "collective_stats",
    "compiled_flops",
    "ring_all_reduce_link_bytes",
    "create_mesh",
    "mesh_from_config",
    "param_spec",
    "variables_shardings",
    "batch_sharding",
    "replicated",
    "shard_variables",
    "shard_batch",
]
