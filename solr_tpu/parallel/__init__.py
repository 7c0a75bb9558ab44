"""Multi-chip / multi-host parallelism (SURVEY.md sections 2.4 and 5).

The reference is single-GPU (one CUDA/OpenCL device; SIMT pixel grid is
its only parallel axis — CudaKernel::render_begin launch).  The TPU
build's parallelism is first-class:

  * tile data-parallel rendering: pixel rows sharded over a
    `jax.sharding.Mesh`, scene/BVH replicated (ICI-broadcast once) —
    `parallel.render.shard_render`;
  * distributed inverse rendering: per-device tile losses, scene-param
    gradients `psum`/reduce-scattered over the mesh —
    `parallel.grads.make_sharded_train_step`;
  * the collectives backend IS XLA over ICI/DCN: `psum`, `all_gather`,
    `ppermute` inside `shard_map` — no NCCL/MPI layer exists or is
    needed.
"""

from solr_tpu.parallel.mesh import (
    device_count,
    make_host_chip_mesh,
    make_mesh,
)
from solr_tpu.parallel.render import shard_render
from solr_tpu.parallel.ring import ring_closest_hit, shard_triangles
from solr_tpu.parallel.grads import (
    init_zero_opt_state,
    make_sharded_train_step,
    sharded_loss_grad,
)
from solr_tpu.parallel.distributed import (
    initialize_distributed,
    is_distributed,
    process_info,
)

__all__ = [
    "make_mesh",
    "make_host_chip_mesh",
    "device_count",
    "shard_render",
    "make_sharded_train_step",
    "init_zero_opt_state",
    "sharded_loss_grad",
    "initialize_distributed",
    "is_distributed",
    "process_info",
]
