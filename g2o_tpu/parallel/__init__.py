from g2o_tpu.parallel.sharded import (
    EDGE_AXIS,
    make_fused_step,
    make_mesh,
    replicate_estimates,
    shard_problem_data,
)

__all__ = [
    "EDGE_AXIS",
    "make_fused_step",
    "make_mesh",
    "replicate_estimates",
    "shard_problem_data",
]
