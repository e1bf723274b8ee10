"""Device-mesh parallelism utilities."""

from rvdd_tpu.parallel.mesh import make_mesh, shard_batch, replicate
