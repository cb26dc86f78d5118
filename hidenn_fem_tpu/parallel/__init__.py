from .sharding import (device_mesh, pad_mesh, shard_mesh, replicate,
                       shard_map_energy, mesh_shardings, ELEM_AXIS)
from .multihost import initialize_multihost, is_multihost, process_summary
from .sharded_mg import mg_pcg_solve_sharded
