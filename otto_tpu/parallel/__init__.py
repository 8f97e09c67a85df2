from otto_tpu.parallel.mesh import make_mesh, init_distributed, shard_rows, row_sharded, batch_sharded, replicated
from otto_tpu.parallel.sharded_embedding import sharded_lookup, sharded_topk, make_sharded_sgns_step
from otto_tpu.parallel.data_parallel import (
    make_dp_gbdt_grow,
    make_dp_ranker_step,
    make_dp_sequence_step,
)

__all__ = [
    "make_mesh", "init_distributed", "shard_rows", "row_sharded", "batch_sharded",
    "replicated", "sharded_lookup", "sharded_topk", "make_sharded_sgns_step",
    "make_dp_ranker_step",
    "make_dp_gbdt_grow",
    "make_dp_sequence_step",
]
