"""Multi-chip scaling: mesh construction, sharding rules, sharded pipelines.

This is the slot the reference leaves empty (SURVEY.md §2.10: no
distributed anything) — the TPU-native framework treats scale-out as a
first-class feature: frames shard across chips over ICI for throughput
(serving), batch+model axes shard for training.
"""

from sudoku_vision_tpu.parallel.mesh import (
    make_mesh, shard_batch, replicate, param_sharding_rules,
)

__all__ = ["make_mesh", "shard_batch", "replicate", "param_sharding_rules"]
