from tdnet_tpu.parallel.mesh import (init_distributed, make_mesh,
                                     make_spatial_mesh, shard_params,
                                     train_shardings)
from tdnet_tpu.parallel.spatial import make_spatial_stream_step
