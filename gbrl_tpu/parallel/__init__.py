from .sharded import (make_mesh, shard_batch, replicate,  # noqa: F401
                      sharded_boost_step, sharded_train_step)
