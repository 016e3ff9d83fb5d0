from .mesh import (DATA_AXIS, MODEL_AXIS, batch_sharding, local_batch_numpy,
                   local_batches_numpy, make_mesh, process_batch_bounds,
                   replicated, shard_batch)
from .multihost import (all_gather_object, barrier, initialize,
                        is_main_process, process_count, process_index)

__all__ = ['DATA_AXIS', 'MODEL_AXIS', 'batch_sharding', 'local_batch_numpy',
           'local_batches_numpy', 'make_mesh', 'process_batch_bounds',
           'replicated', 'shard_batch',
           'all_gather_object', 'barrier', 'initialize', 'is_main_process',
           'process_count', 'process_index']
