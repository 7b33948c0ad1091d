"""Multi-chip / multi-host sharded solving (mesh, shard_map, collectives)."""
from .sharded import (host_replicated, init_distributed, local_axis,
                      make_mesh, process_local_batch, replicate,
                      shard_batch, solve_sharded_shared)
from .tensor import (solve_loop_tp, tp_bank_sharding, tp_chunk_runner,
                     tp_pad_dim, tp_replicated)

__all__ = [
    "make_mesh", "shard_batch", "replicate", "solve_sharded_shared",
    "init_distributed", "process_local_batch", "local_axis",
    "host_replicated",
    "solve_loop_tp", "tp_bank_sharding", "tp_chunk_runner", "tp_pad_dim",
    "tp_replicated",
]
