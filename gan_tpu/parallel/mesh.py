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
    and tests must run on the virtual 8-device CPU backend (SURVEY §4).

    When the override is set, ``jax_default_device`` is pinned to the chosen
    platform too, so un-sharded array creation (param init, PRNG keys, jit
    without shardings) lands there instead of on the registered TPU plugin's
    default device. Without the pin every such array is created on the TPU
    and then tunneled cross-platform — on the axon tunnel a single 4×4
    transfer was measured at 39 s (predict-mode init with hundreds of param
    leaves appears to hang)."""
    platform = os.environ.get("GAN_TPU_PLATFORM")
    if platform:
        devs = jax.devices(platform)
        if jax.config.jax_default_device is None or \
                jax.config.jax_default_device.platform != devs[0].platform:
            jax.config.update("jax_default_device", devs[0])
        return devs
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


def put_global(arr, sharding, *, global_rows: int | None = None):
    """Place a host array under ``sharding``, correctly at any process count.

    Single-controller: plain ``jax.device_put``. Multi-controller (a real
    ``jax.distributed`` pod, SURVEY §5.8): ``device_put`` onto a sharding
    with non-addressable devices throws, so the global array is assembled
    with ``jax.make_array_from_process_local_data``:

      * ``global_rows=None`` — ``arr`` is the FULL global array, identical on
        every process (deterministic decode of a shared file list); each
        process contributes the rows its devices own.
      * ``global_rows=N`` — ``arr`` holds only THIS process's rows of a
        leading-axis-sharded global array of N rows (per-process file
        sharding via :func:`process_stripe_rows`), in global shard order.
    """
    if jax.process_count() == 1:
        return jax.device_put(arr, sharding)

    def one(a):
        a = np.ascontiguousarray(a)
        gs = a.shape if global_rows is None else (global_rows,) + a.shape[1:]
        return jax.make_array_from_process_local_data(sharding, a, gs)

    return jax.tree_util.tree_map(one, arr)


def process_stripe_rows(n: int, mesh: Mesh, *,
                        process_index: int | None = None) -> np.ndarray:
    """ORIGINAL row indices this process must load for a striped cache
    (train/loop.py put_cache: row i → device i % ndev), in the order its
    devices' blocks expect — incl. the wrap-padding rows. Pod-scale data
    loading: each host decodes only ``process_stripe_rows(n, mesh)`` of the
    shared file list and passes the result to put_cache(process_local=True);
    nothing else ever materializes the whole corpus on one host."""
    if process_index is None:
        process_index = jax.process_index()
    ndev = mesh.size
    l = -(-max(n, 1) // ndev)
    local = [d for d in range(ndev)
             if mesh.devices.flat[d].process_index == process_index]
    rows = np.asarray(local)[:, None] + np.arange(l)[None, :] * ndev
    return np.where(rows < max(n, 1), rows, rows % max(n, 1)).reshape(-1)


def shard_batch(batch, mesh: Mesh):
    """Place a host array with its leading axis sharded over the mesh; the
    full batch is expected on every process (see put_global)."""
    return put_global(batch, batch_sharding(mesh))
