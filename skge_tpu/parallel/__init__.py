"""Multi-chip SPMD: mesh construction, shardings, distributed train steps."""

from skge_tpu.parallel.mesh import (
    DATA_AXIS,
    MODEL_AXIS,
    batch_sharding,
    make_mesh,
    mask_sharding,
    param_specs,
    shard_state,
    state_shardings,
)
from skge_tpu.parallel.sharded import (
    make_sharded_pairwise_step,
    make_sharded_pointwise_step,
    make_sharded_score_all_o,
)
from skge_tpu.parallel.shardmap_step import (
    make_shardmap_pairwise_step,
    make_shardmap_pointwise_step,
    make_shardmap_sampled_ce_step,
    make_shardmap_selfadv_step,
    shard_state_shardmap,
)
from skge_tpu.parallel.partitioned import (
    SHARD_AXIS,
    PartitionedTrainer,
    RelabeledPoolSampler,
    init_state_partitioned,
    make_partitioned_epoch,
    make_partitioned_pairwise_step,
    make_partitioned_selfadv_step,
    make_shard_mesh,
    object_boundary_cap,
    relabel_entities,
    shard_state_partitioned,
)
from skge_tpu.parallel import distributed

__all__ = [
    "SHARD_AXIS",
    "distributed",
    "init_state_partitioned",
    "PartitionedTrainer",
    "RelabeledPoolSampler",
    "make_partitioned_epoch",
    "make_partitioned_pairwise_step",
    "make_partitioned_selfadv_step",
    "make_shard_mesh",
    "object_boundary_cap",
    "relabel_entities",
    "shard_state_partitioned",
    "DATA_AXIS",
    "MODEL_AXIS",
    "make_mesh",
    "param_specs",
    "shard_state",
    "state_shardings",
    "batch_sharding",
    "mask_sharding",
    "make_sharded_pairwise_step",
    "make_sharded_pointwise_step",
    "make_sharded_score_all_o",
    "make_shardmap_pairwise_step",
    "make_shardmap_pointwise_step",
    "make_shardmap_sampled_ce_step",
    "make_shardmap_selfadv_step",
    "shard_state_shardmap",
]
