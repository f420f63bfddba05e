from .mesh import (make_data_mesh, shard_batch, replicate, DATA_AXIS,
                   make_member_mesh, shard_member_axis, MEMBER_AXIS)
from .train_parallel import (make_parallel_train_step,
                             make_parallel_eval_step,
                             make_scanned_parallel_step,
                             make_scanned_parallel_epochs)
from .multihost import (initialize_multihost, local_batch_slice,
                        global_batch_from_local, MultihostBatchIterator)
