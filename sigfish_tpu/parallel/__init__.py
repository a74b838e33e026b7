from .shard import (  # noqa: F401
    make_mesh,
    shard_tracks,
    sharded_engine_topk,
    sharded_sdtw,
    sharded_sdtw_step,
)
