from .mesh import (DATA_AXIS, MODEL_AXIS, data_sharding, host_local_batch,
                   make_mesh, param_partition_spec, process_slice, replicate,
                   replicated, shard_batch, shard_params)
from .comm import all_gather, pmean, ppermute, psum, sharded_topk_merge
from .multihost import (first_local_value, gather_replicated,
                        global_batch_from_local, initialize_distributed,
                        replicate_global, shard_params_global)
