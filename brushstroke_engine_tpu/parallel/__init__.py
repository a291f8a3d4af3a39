from brushstroke_engine_tpu.parallel.mesh import (
    make_mesh, shard_batch, replicate, make_dp_train_step,
    shard_tile_render,
)
