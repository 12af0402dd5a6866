from vidcap_tpu.parallel.mesh import make_mesh  # noqa: F401
from vidcap_tpu.parallel.sharding import (make_sharded_xe_step,  # noqa: F401
                                          param_shardings, shard_batch)
