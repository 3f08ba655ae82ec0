"""Device-side epoch runner: one jitted ``shard_map`` + ``lax.scan`` per epoch.

The reference's hot loop pulls four loss scalars to the host after *every*
mini-batch (pix2pix.py:276-279 ``.numpy()`` — a device→host sync per step,
SURVEY §3.1). Here an entire epoch — gather from the device-resident uint8
cache, fused augment, G/D forward+backward, Adam updates — runs as ONE
compiled program per epoch; losses come back as a single (n_steps, K) array.

Data parallelism: the cache is sharded along its sample axis over the
``data`` mesh axis, per-device index permutations are sharded along the batch
axis, params/opt-states are replicated, and the step function psum-means its
gradients — the SPMD layout from SURVEY §2.7/§5.8. A 1-device mesh reproduces
the reference's single-device semantics exactly.
"""

from __future__ import annotations

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from gan_tpu.parallel.mesh import DATA_AXIS, batch_sharding


def make_cached_epoch(mesh, extract_fn: Callable, step_fn: Callable, *,
                      training: bool):
    """Build ``epoch(params, opt_states, caches, perms, key)``.

    extract_fn(caches, idxs, key) -> batch pytree — per-device gather +
        fused augment/normalize (gan_tpu.data.augment).
    step_fn(params, opt_states, batch, key) ->
        training: (params, opt_states, losses_vec)  [psum-mean grads inside]
        eval:     losses_vec
    caches: pytree of (N_pad, ...) arrays sharded P('data') on axis 0.
    perms:  matching pytree of (n_steps, B) int32 local indices, sharded
        P(None, 'data') on the batch axis.
    Returns (params, opt_states, losses (n_steps, K)).
    """

    def epoch(params, opt_states, caches, perms, key):
        d_idx = jax.lax.axis_index(DATA_AXIS)

        def body(carry, xs):
            params, opt_states = carry
            idxs, step = xs
            k = jax.random.fold_in(jax.random.fold_in(key, step), d_idx)
            k_data, k_step = jax.random.split(k)
            batch = extract_fn(caches, idxs, k_data)
            if training:
                params, opt_states, losses = step_fn(params, opt_states, batch, k_step)
            else:
                losses = step_fn(params, opt_states, batch, k_step)
            losses = jax.lax.pmean(losses, DATA_AXIS)
            return (params, opt_states), losses

        n_steps = jax.tree_util.tree_leaves(perms)[0].shape[0]
        (params, opt_states), losses = jax.lax.scan(
            body, (params, opt_states), (perms, jnp.arange(n_steps)))
        return params, opt_states, losses

    sm = jax.shard_map(
        epoch, mesh=mesh,
        in_specs=(P(), P(), P(DATA_AXIS), P(None, DATA_AXIS), P()),
        out_specs=(P(), P(), P()),
        check_vma=False,
    )
    donate = (0, 1) if training else ()
    return jax.jit(sm, donate_argnums=donate)


def fetch_rows(cache, idxs, mode: str):
    """Gather ``idxs`` rows of the leading axis by the fastest strategy.

    ``jnp.take`` row-gather measured catastrophically slow on v5e (4.1 s for
    128×163 KB uint8 rows vs 2 ms for either alternative), so:
    * ``contig`` — rows are consecutive ascending (fixed-order epochs):
      one dynamic slice starting at idxs[0].
    * ``onehot`` — arbitrary rows via a one-hot selector matmul on the MXU;
      exact for uint8 values (≤255 representable in bf16, one nonzero per
      row). Reads the whole cache per call — only for small caches.
    * ``take`` — plain gather fallback (arbitrary rows, any cache size).
    Returns integer-valued rows (uint8 or bf16 — both feed the normalize /
    crop stages identically)."""
    if mode == "contig":
        return jax.lax.dynamic_slice_in_dim(cache, idxs[0], idxs.shape[0], axis=0)
    if mode == "onehot":
        n = cache.shape[0]
        sel = (idxs[:, None] == jnp.arange(n)[None, :]).astype(jnp.bfloat16)
        flat = cache.reshape(n, -1).astype(jnp.bfloat16)
        return (sel @ flat).reshape((idxs.shape[0],) + cache.shape[1:])
    return jnp.take(cache, idxs, axis=0)


# one-hot gather reads the whole cache per step; cap where that stays cheap
ONEHOT_GATHER_MAX_ROWS = 4096


def gather_mode(n_rows: int, *, fixed_order: bool, n_devices: int) -> str:
    """Pick the fetch_rows strategy for an epoch (see fetch_rows)."""
    if fixed_order and n_devices == 1:
        return "contig"
    if n_rows <= ONEHOT_GATHER_MAX_ROWS:
        return "onehot"
    return "take"


def put_cache(cache_np: np.ndarray, mesh) -> jax.Array:
    """Device-put a host cache with its sample axis sharded over the mesh,
    zero-padding N to a multiple of the mesh size (pad rows are never indexed
    by the perms built in :func:`local_perm`)."""
    n = cache_np.shape[0]
    ndev = mesh.size
    n_pad = -(-max(n, 1) // ndev) * ndev
    if n_pad != n:
        pad = np.zeros((n_pad - n,) + cache_np.shape[1:], cache_np.dtype)
        cache_np = np.concatenate([cache_np, pad], axis=0)
    return jax.device_put(cache_np, batch_sharding(mesh))


def local_perm(n: int, *, ndev: int, n_steps: int, per_dev_batch: int,
               rng: np.random.Generator | None, fixed_order: bool) -> np.ndarray:
    """(n_steps, ndev * per_dev_batch) int32 of *local* cache indices.

    Column block d (width per_dev_batch) indexes device d's local shard.
    Device d owns global rows [d*L, (d+1)*L) of the padded cache; only its
    ``real_d`` real rows are ever drawn. Orders are cycled when a device
    needs more samples than it owns (only possible at ndev > 1 — the
    reference is single-device so parity is exact at ndev == 1).

    fixed_order=True reproduces Pix2Pix's fixed epoch order (the train list
    is shuffled once at split time and never reshuffled — pix2pix.py:147 has
    no per-epoch dataset shuffle); False draws a fresh permutation (CycleGAN's
    reshuffle_each_iteration=True, cycle_gan.py:140-150).
    """
    l = -(-max(n, 1) // ndev)
    need = n_steps * per_dev_batch
    cols = []
    for d in range(ndev):
        real = min(max(n - d * l, 1), l)
        order = np.arange(real) if fixed_order else rng.permutation(real)
        reps = -(-need // real)
        if not fixed_order and reps > 1:
            order = np.concatenate([rng.permutation(real) for _ in range(reps)])
        else:
            order = np.tile(order, reps)
        cols.append(order[:need].reshape(n_steps, per_dev_batch))
    return np.concatenate(cols, axis=1).astype(np.int32)


def epoch_plan(n: int, batch_size: int, ndev: int) -> tuple[int, int, int]:
    """(n_steps, per_dev_batch, remainder).

    ndev == 1: n_steps = n // batch_size full batches plus a ``remainder``
    partial batch, matching tf.data's non-drop batching (pix2pix.py:156).
    ndev > 1: remainder is dropped (DP throughput mode) and batch_size must
    divide by ndev.
    """
    if ndev == 1:
        return n // batch_size, batch_size, n % batch_size
    assert batch_size % ndev == 0, (
        f"global batch {batch_size} must divide across {ndev} devices")
    return n // batch_size, batch_size // ndev, 0


def losses_to_dict(losses_np: np.ndarray, keys) -> dict:
    """(n_steps, K) per-step losses → {key: [per-step floats]} (the reference
    accumulates per-mini-batch loss lists, pix2pix.py:276-279)."""
    return {k: [float(v) for v in losses_np[:, i]] for i, k in enumerate(keys)}
