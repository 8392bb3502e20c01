from m3t_tpu.parallel.sharding import (
    initialize_distributed,
    make_mesh,
    shard_over,
    track_sequences_scan,
)
