from sonicscribe_tpu.parallel.mesh import (  # noqa: F401
    make_mesh,
    replicate_params,
    shard_batch,
)
