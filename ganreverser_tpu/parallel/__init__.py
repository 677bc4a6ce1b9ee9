from .mesh import (DATA_AXIS, MODEL_AXIS, data_sharding, make_mesh,
                   param_partition_spec, replicate, replicated, shard_batch,
                   shard_params)
from .comm import all_gather, pmean, ppermute, psum, sharded_topk_merge
