"""Device mesh construction and sharding helpers.

One logical axis (``data``) is all these model sizes need (SURVEY §2.7: U-Net
≈54M params at C=1 — no TP/PP); scaling is batch sharding with gradient
all-reduce over ICI. The helpers are deliberately thin wrappers over
``jax.sharding`` so trainers stay explicit about placement.
"""

from __future__ import annotations

import os

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def default_devices():
    """Devices for the configured platform.

    ``GAN_TPU_PLATFORM`` (e.g. ``cpu``) overrides the JAX default — needed
    because TPU platform plugins may register regardless of ``JAX_PLATFORMS``,
    and tests must run on the virtual 8-device CPU backend (SURVEY §4)."""
    platform = os.environ.get("GAN_TPU_PLATFORM")
    if platform:
        return jax.devices(platform)
    return jax.devices()


def init_multihost(**kwargs) -> int:
    """Initialize cross-host JAX for pod-scale data parallelism; returns the
    resolved process count.

    Call once per host before building a mesh (SURVEY §5.8: single-controller
    JAX, gradient all-reduce over ICI within a pod, DCN across pods). The
    CLIs call this when ``GAN_TPU_MULTIHOST=1``; on Cloud TPU pods
    ``jax.distributed.initialize`` auto-discovers coordinator/process
    settings, elsewhere pass ``coordinator_address`` / ``num_processes`` /
    ``process_id`` explicitly.

    Failure semantics (a silent fallback here would degrade a pod job to N
    independent single-host trainings): auto-detection finding no cluster
    environment is the one benign case and returns 1; everything else —
    explicit settings that fail, a dead coordinator, version mismatches —
    re-raises."""
    import jax
    from jax._src import distributed as _distributed

    # probe the coordination client directly — jax.process_count() would
    # initialize the XLA backend, after which distributed.initialize refuses
    if getattr(_distributed.global_state, "client", None) is not None:
        return _distributed.global_state.num_processes  # already initialized
    try:
        jax.distributed.initialize(**kwargs)
    except Exception as e:
        auto = not kwargs.get("coordinator_address")
        if auto and ("coordinator_address" in str(e)
                     or "auto" in str(e).lower()
                     or "detect" in str(e).lower()):
            return 1  # genuinely single-process: no cluster env to join
        if auto and "must be called before" in str(e):
            # backend already live and no cluster was configured — benign on
            # a single host; a real pod must init before any JAX op
            print("[gan_tpu] multihost auto-init skipped: JAX backend already "
                  "initialized", flush=True)
            return 1
        raise
    n = _distributed.global_state.num_processes
    print(f"[gan_tpu] multihost initialized: {n} processes, coordinator "
          f"{_distributed.global_state.coordinator_address}", flush=True)
    return n


def make_mesh(num_devices: int = 0, *, devices=None) -> Mesh:
    """1-D data-parallel mesh. ``num_devices=0`` → all devices of the
    configured platform."""
    if devices is None:
        devices = default_devices()
    if num_devices and num_devices > 0:
        assert len(devices) >= num_devices, (
            f"requested {num_devices} devices, have {len(devices)}")
        devices = devices[:num_devices]
    return Mesh(np.asarray(devices), (DATA_AXIS,))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading (batch / dataset-N) axis sharded over ``data``."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh):
    """Device-put a host array with its leading axis sharded over the mesh."""
    return jax.device_put(batch, batch_sharding(mesh))
