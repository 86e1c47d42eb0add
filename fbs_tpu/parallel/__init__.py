from fbs_tpu.parallel.mesh import make_mesh, particle_sharding, replicated, P, Mesh, NamedSharding
from fbs_tpu.parallel.sharded import (
    shard_particle_closures,
    shard_fused_kernel,
    data_parallel_loss,
)
from fbs_tpu.parallel.resampling import make_ring_take, onehot_gather, ring_take
from fbs_tpu.parallel.tensor import (
    tp_shardings,
    shard_params_tp,
    tensor_parallel_score,
)
