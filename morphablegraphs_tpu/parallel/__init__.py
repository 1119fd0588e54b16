"""Device-mesh parallelism for crowd synthesis and batched serving."""

from .crowd import (make_mesh, shard_crowd_inputs, replicate_model,
                    crowd_walk_sharded, constrained_crowd_sharded)
