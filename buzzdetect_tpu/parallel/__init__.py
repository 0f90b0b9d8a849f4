from buzzdetect_tpu.parallel.mesh import (  # noqa: F401
    make_mesh, data_sharding, replicated_sharding, shard_files,
    resolve_replica_devices)
