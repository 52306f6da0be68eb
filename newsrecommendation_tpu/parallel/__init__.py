from newsrecommendation_tpu.parallel.mesh import (  # noqa: F401
    make_mesh,
    replicate,
    shard_batch,
)
from newsrecommendation_tpu.parallel.sharded_embedding import (  # noqa: F401
    gather_rows_sharded,
    shard_table,
)
