from hyperseg_tpu.parallel.mesh import (make_mesh, make_mesh_for_batch, replicated,
                                        data_sharded, shard_batch, replicate_params)
