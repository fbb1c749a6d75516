from hyperseg_tpu.parallel.mesh import (make_mesh, replicated, data_sharded,
                                        shard_batch, replicate_params)
