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

from solr_tpu.parallel.mesh import make_mesh, device_count
from solr_tpu.parallel.render import shard_render
from solr_tpu.parallel.grads import make_sharded_train_step, sharded_loss_grad

__all__ = [
    "make_mesh",
    "device_count",
    "shard_render",
    "make_sharded_train_step",
    "sharded_loss_grad",
]
