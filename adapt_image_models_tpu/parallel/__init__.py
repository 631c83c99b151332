from adapt_image_models_tpu.parallel.partition import (
    is_trainable_path, trainable_mask, partition_params, merge_params,
    count_params,
)
from adapt_image_models_tpu.parallel.mesh import (
    make_mesh, make_hybrid_mesh, batch_sharding, replicated_sharding,
    shard_batch,
)
