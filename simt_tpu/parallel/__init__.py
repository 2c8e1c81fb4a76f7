from .mesh import (
    DATA_AXIS,
    SPATIAL_AXIS,
    batch_sharding,
    initialize_multihost,
    make_mesh,
    put_global,
    replicate_state,
    replicated,
    shard_batch,
)
