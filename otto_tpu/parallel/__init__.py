from otto_tpu.parallel.mesh import make_mesh, init_distributed, shard_rows, row_sharded, batch_sharded, replicated
from otto_tpu.parallel.sharded_embedding import sharded_lookup, sharded_topk, make_sharded_sgns_step
from otto_tpu.parallel.data_parallel import (
    make_dp_gbdt_grow,
    make_dp_ranker_step,
    make_dp_sequence_step,
)
from otto_tpu.parallel.model_parallel import (
    make_pp_sequence_step,
    make_tp_sequence_step,
    pp_param_specs,
    shard_params,
    stack_pipeline_params,
    tp_param_specs,
)
from otto_tpu.parallel.expert_parallel import (
    init_moe,
    init_moe_recommender,
    make_ep_moe_step,
    moe_apply,
    moe_param_specs,
    moe_recommender_specs,
)

__all__ = [
    "make_mesh", "init_distributed", "shard_rows", "row_sharded", "batch_sharded",
    "replicated", "sharded_lookup", "sharded_topk", "make_sharded_sgns_step",
    "make_dp_ranker_step",
    "make_dp_gbdt_grow",
    "make_dp_sequence_step",
    "make_tp_sequence_step", "make_pp_sequence_step", "tp_param_specs",
    "pp_param_specs", "shard_params", "stack_pipeline_params",
    "init_moe", "init_moe_recommender", "make_ep_moe_step", "moe_apply",
    "moe_param_specs", "moe_recommender_specs",
]
