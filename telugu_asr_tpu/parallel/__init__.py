from telugu_asr_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
    replicated_sharding,
    shard_batch,
)
from telugu_asr_tpu.parallel.pipeline import pipeline_blocks, stack_block_params

__all__ = [
    "make_mesh",
    "batch_sharding",
    "replicated_sharding",
    "shard_batch",
    "pipeline_blocks",
    "stack_block_params",
]
