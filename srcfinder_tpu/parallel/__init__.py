"""Device-mesh sharding utilities (pjit / shard_map over jax.sharding.Mesh).

The reference scales with torch DataParallel, fork pools and AWS Lambda
fan-out (SURVEY §2 parallelism inventory); here all device-level
parallelism is SPMD over an ICI mesh: detector columns (CMF), tiles/shifts
(CNN/FCN), and batches (training) are sharded with NamedSharding and XLA
inserts the collectives.
"""

from .mesh import (make_mesh, column_sharding, batch_sharding,
                   replicated_sharding, shard_columns_mf,
                   shard_fcn_shifts)
