"""Data-parallel mesh / sharding utilities — the rebuild's new first-class
distributed component (the reference is single-device: it prints the GPU
count and never uses it, base_gan.py:18-19; SURVEY §2.7).

Design: single-controller JAX, 1-D ``Mesh(('data',))`` over the local TPU
chips; batches sharded along ``data``; params/opt-states replicated;
gradients ``psum``-reduced over ICI inside a ``shard_map``-wrapped train step.
Multi-host scale-out hooks via ``jax.distributed.initialize`` (DCN between
pods) when needed.
"""

from gan_tpu.parallel.mesh import (
    make_mesh, batch_sharding, replicated_sharding, shard_batch, DATA_AXIS,
    default_devices,
)

__all__ = ["make_mesh", "batch_sharding", "replicated_sharding", "shard_batch",
           "DATA_AXIS", "default_devices"]
