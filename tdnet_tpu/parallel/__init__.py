from tdnet_tpu.parallel.group_stream import (make_group_stream_step,
                                             make_path_mesh)
from tdnet_tpu.parallel.mesh import (init_distributed, make_mesh,
                                     make_spatial_mesh, shard_params,
                                     train_shardings)
from tdnet_tpu.parallel.spatial import make_spatial_stream_step
