from forest_benchmarking_tpu.parallel.sharding import (  # noqa: F401
    make_mesh, shard_batch, replicate, batch_sharded, shard_map_batched)
