"""Device-side epoch runner: one jitted ``shard_map`` + ``lax.scan`` per epoch.

The reference's hot loop pulls four loss scalars to the host after *every*
mini-batch (pix2pix.py:276-279 ``.numpy()`` — a device→host sync per step,
SURVEY §3.1). Here an entire epoch — gather from the device-resident uint8
cache, fused augment, G/D forward+backward, Adam updates — runs as ONE
compiled program per epoch; losses come back as a single (n_steps, K) array.

Data parallelism: the cache is **striped** over the ``data`` mesh axis
(original row ``i`` lands on device ``i % ndev`` at local index
``i // ndev`` — :func:`put_cache`), per-device index permutations are sharded
along the batch axis, params/opt-states are replicated, and the step function
psum-means its gradients — the SPMD layout from SURVEY §2.7/§5.8. Striping
makes a fixed-order global batch equal a *contiguous local slice* on every
device, so DP batches have exactly the reference's single-device composition
(global batch s = original rows [s·B, (s+1)·B)), and real rows spread evenly
across devices (no all-padding shards). A 1-device mesh reproduces the
reference's semantics bit-for-bit.

Gather strategy (measured on v5e, whole scanned epochs — eager per-dispatch
timings over the axon tunnel are meaningless and round 1's "4.1 s per
jnp.take" figure was exactly that artifact):
  * ``contig``  — 1.3 ms per 128-row step at 25.6k rows (dynamic slice).
  * ``take``    — 2.5 ms per 128-row step at 25.6k rows; also *faster* than
    the round-1 one-hot MXU gather at 4096 rows (308 vs 292 pairs/s end to
    end), so the one-hot path was removed.
Cache layout: the epoch program prefers a (C-major, HW-tiled) layout for the
uint8 caches; feeding ``device_put``'s default compact layout makes XLA
materialize a full relayout *copy* of the cache inside the program (2.64 GB +
1.4× tile padding per 25.6k-row domain — OOM at reference scale). So
:func:`put_cache` relays every cache ON DEVICE into the preferred layout up
front (donated identity jit with an explicit out_shardings Format) — the copy
disappears from the epoch program and only the per-step batch is relaid
(~5 MB). Host→device transfers directly into custom layouts crash the axon
runtime, hence the two-step transfer-then-relayout.

Program-length ceiling: the axon worker faults on epoch programs that
*execute* too long (round-3 bracket — ~65 s programs pass, ~82 s+ fault —
while XLA memory_analysis clears the crashers of OOM). Long epochs therefore
run as balanced SEGMENTS of one compiled scan program (
:func:`run_epoch_segments` + the trainers' per-step cost models via
:func:`seg_max_steps`): params/opt-states chain between segments as donated
device futures (no host sync), and the epoch program takes a traced ``step0``
so the global per-step RNG stream continues across segments — a segmented
epoch is bit-identical to the single-program epoch (tests/test_segments.py).
"""

from __future__ import annotations

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from gan_tpu.parallel.mesh import DATA_AXIS, batch_sharding, put_global

LOSS_KEY_AXIS = None  # losses are (K,) vectors; kept for readability


def make_cached_epoch(mesh, extract_fn: Callable, step_fn: Callable, *,
                      training: bool):
    """Build ``epoch(params, opt_states, caches, perms, key)``.

    extract_fn(caches, idxs, key) -> batch pytree — per-device gather +
        fused augment/normalize (gan_tpu.data.augment).
    step_fn(params, opt_states, batch, key) ->
        training: (params, opt_states, losses_vec)  [psum-mean grads inside]
        eval:     losses_vec
    caches: pytree of (N_pad, ...) arrays striped P('data') on axis 0
        (see put_cache).
    perms:  matching pytree of (n_steps, B) int32 local indices, sharded
        P(None, 'data') on the batch axis.
    Returns (params, opt_states, losses (n_steps, K)).
    """

    def epoch(params, opt_states, caches, perms, key, step0):
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
            body, (params, opt_states), (perms, step0 + jnp.arange(n_steps)))
        return params, opt_states, losses

    sm = jax.shard_map(
        epoch, mesh=mesh,
        in_specs=(P(), P(), P(DATA_AXIS), P(None, DATA_AXIS), P(), P()),
        out_specs=(P(), P(), P()),
        check_vma=False,
    )
    donate = (0, 1) if training else ()
    jitted = jax.jit(sm, donate_argnums=donate)

    # step0 is a TRACED scalar: epoch segments (run_epoch_segments) reuse one
    # compiled program per segment LENGTH while the global step index — and
    # with it the per-step RNG stream — continues across segment calls.
    def call(params, opt_states, caches, perms, key, step0=0):
        return jitted(params, opt_states, caches, perms, key,
                      jnp.asarray(step0, jnp.int32))

    # AOT probes (benchmarks/hbm_probe.py) lower the exact executable
    call.lower = lambda p, o, c, pr, k, step0=0: jitted.lower(
        p, o, c, pr, k, jnp.asarray(step0, jnp.int32))
    return call


# The axon TPU worker faults on epoch programs that EXECUTE too long: the
# round-3 bracket (benchmarks/cg_hbm_probe.py + live runs) separates cleanly
# on single-program wall time — CycleGAN 625-step/65 s programs pass, 795-step
# (~83 s) and 3000-step/82+ s programs fault — while XLA's own memory_analysis
# puts the crashing programs at 5.3 GB of 16 (not OOM) and argument bytes
# below passing Pix2Pix configs. run_epoch_segments bounds every epoch
# program near this target by splitting the scan into balanced segments that
# chain params/opt-states (donated) and CONTINUE the global step index, so a
# segmented epoch is bit-identical to the single-program epoch (tested).
SEG_TARGET_SECONDS = 40.0


def seg_max_steps(per_dev_batch: int, img_size: int, mesh, *,
                  t_min_ms: float, t_img_ms: float) -> int:
    """Steps-per-program cap for :func:`run_epoch_segments`.

    Per-step time is estimated as ``max(t_min_ms, per_dev_batch · t_img_ms ·
    (img/256)²)`` — a dispatch/fixed-cost floor plus a conservative per-image
    cost, both measured per model at 256² on v5e (trainer constants; the
    floor dominates at small batch where throughput doesn't scale down
    linearly). Returns 0 (no segmentation) off-TPU — the fault is
    axon-stack-specific and CPU test meshes should exercise the
    single-program path by default. Overrides: GAN_TPU_EPOCH_SEG_STEPS
    (0 disables; any platform), GAN_TPU_EPOCH_SEG_SECONDS (target time)."""
    import os

    env = os.environ.get("GAN_TPU_EPOCH_SEG_STEPS")
    if env is not None:
        return int(env)
    if mesh.devices.flat[0].platform != "tpu":
        return 0
    target = float(os.environ.get("GAN_TPU_EPOCH_SEG_SECONDS",
                                  SEG_TARGET_SECONDS))
    step_s = max(t_min_ms,
                 per_dev_batch * t_img_ms * (img_size / 256.0) ** 2) / 1e3
    return max(1, int(target / step_s))


def run_epoch_segments(fn, params, opt_states, caches, perms, key, *,
                       max_steps: int = 0):
    """Run a cached epoch as one or more scan programs of ≤ ``max_steps``
    steps (see SEG_TARGET_SECONDS). Segments are balanced (at most two
    distinct lengths → at most two compiled programs), dispatched
    back-to-back without host syncs — params/opt-states chain as donated
    device futures — and the per-step RNG stream continues across segments
    via the epoch program's ``step0``, so results are bit-identical to the
    unsegmented call. ``max_steps <= 0`` runs the single-program path."""
    n_steps = jax.tree_util.tree_leaves(perms)[0].shape[0]
    if max_steps <= 0 or n_steps <= max_steps:
        return fn(params, opt_states, caches, perms, key)
    n_seg = -(-n_steps // max_steps)
    q = -(-n_steps // n_seg)
    parts = []
    lo = 0
    while lo < n_steps:
        hi = min(lo + q, n_steps)
        sub = jax.tree_util.tree_map(lambda p: p[lo:hi], perms)
        params, opt_states, losses = fn(params, opt_states, caches, sub,
                                        key, step0=lo)
        parts.append(losses)
        lo = hi
    losses = np.concatenate([np.asarray(l) for l in parts], axis=0)
    return params, opt_states, losses


def make_sharded_step(mesh, prep_fn: Callable, step_fn: Callable, *,
                      training: bool):
    """One jitted shard_map'd step over a uint8 batch sharded P('data') — the
    streaming-path analog of :func:`make_cached_epoch` (host feeds batches,
    device still does prep + psum'd DP step in one program).

    prep_fn(u8_batch, key) -> batch pytree; step_fn as in make_cached_epoch.
    The caller passes ``key = fold_in(epoch_key, step)``; the device index is
    folded in here, so per-device RNG streams equal the cached epoch runner's.
    For the per-SAMPLE pairing (augment/dropout lanes, per-device BN stats) to
    match too, the caller must stripe-reorder each full batch before sharding
    (``batch[stripe_order(B, ndev)]`` — device d's block then holds rows
    ≡ d (mod ndev), the cached cache's striping). With that, a streamed
    fixed-order epoch reproduces a cached one up to XLA fusion/summation-order
    float noise (~1e-6 rel — the scan program and the per-batch programs fuse
    differently), at any per-device batch size (tested)."""

    def one(params, opt_states, u8, key):
        d_idx = jax.lax.axis_index(DATA_AXIS)
        k_data, k_step = jax.random.split(jax.random.fold_in(key, d_idx))
        batch = prep_fn(u8, k_data)
        if training:
            params, opt_states, losses = step_fn(params, opt_states, batch, k_step)
        else:
            losses = step_fn(params, opt_states, batch, k_step)
        losses = jax.lax.pmean(losses, DATA_AXIS)
        if training:
            return params, opt_states, losses
        return losses

    sm = jax.shard_map(
        one, mesh=mesh,
        in_specs=(P(), P(), P(DATA_AXIS), P()),
        out_specs=(P(), P(), P()) if training else P(),
        check_vma=False,
    )
    return jax.jit(sm)


# XLA:TPU lowers a gather over wide uint8 rows as "mini-gathers" over
# <=32,768-byte column slices of the operand; when the operand is a single
# wide parameter, those loop-invariant slices MATERIALIZE as temps the size
# of the whole cache (read from the optimized HLO, round 3 — doubling flat
# storage's HBM cost). Pre-splitting the cache into strips of exactly this
# width at put time makes each mini-gather consume a parameter directly:
# measured, the cache-sized temp disappears.
FLAT_STRIP_BYTES = 32_768


@jax.tree_util.register_pytree_node_class
class FlatCache:
    """Device cache stored FLAT — rows as raw uint8 bytes, original sample
    shape kept as static aux. Flat storage has no (8, 128) image-tile
    padding (strip widths round to 128 lanes — <0.1% vs the tiled layout's
    1.35× at 286²), so ~35% more rows fit under the device-resident fault
    ceiling (loader.DEVICE_CACHE_SAFE_BYTES); rows are reshaped to image
    form per batch AFTER the gather (~MBs per step, not the whole cache).

    Storage is two-level: ``strips`` is a tuple over COLUMN strips (each
    ≤ FLAT_STRIP_BYTES wide — matching XLA's mini-gather slicing, see
    above); each entry is one (rows, width) array, or a tuple of row-chunk
    arrays when a single buffer would exceed CHUNK_LIMIT_BYTES. Every leaf
    stripes P('data') on axis 0 exactly like tiled caches, so shard_map
    in_specs need no change."""

    def __init__(self, strips, sample_shape):
        self.strips = tuple(tuple(s) if isinstance(s, (tuple, list)) else s
                            for s in strips)
        self.sample_shape = tuple(sample_shape)

    def tree_flatten(self):
        return self.strips, self.sample_shape

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children, aux)


def fetch_rows(cache, idxs, mode: str):
    """Gather ``idxs`` rows of the leading axis.

    ``cache`` may be a :class:`FlatCache` — rows are gathered from the flat
    (N_pad, row_bytes) chunks and reshaped to sample form afterwards, so
    only the batch (not the cache) ever changes layout in-program.

    * ``contig`` — rows are consecutive ascending (fixed-order epochs):
      one dynamic slice starting at idxs[0].
    * ``take``   — arbitrary rows via gather; ~2.5 ms per 128 rows at 25.6k
      rows under lax.scan on v5e (see module docstring).

    ``cache`` may be a TUPLE of equal-length chunks (put_cache splits caches
    whose tile-padded image layout would exceed ~2 GiB per buffer — larger
    single buffers crash the TPU runtime, bracketed empirically at
    1.77 GB ok / 2.21 GB crash ⇒ the int32-bytes boundary). Local row i
    lives in chunk i // lk at offset i % lk; every chunk is gathered at the
    batch's offsets (a few ms each) and the right rows selected — exact, and
    cheap next to a train step."""
    if isinstance(cache, FlatCache):
        parts = [fetch_rows(s, idxs, mode) for s in cache.strips]
        rows = parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=1)
        return rows.reshape((idxs.shape[0],) + cache.sample_shape)
    if isinstance(cache, (tuple, list)):
        lk = cache[0].shape[0]
        cid = idxs // lk
        sub = idxs % lk
        rows = jnp.take(cache[0], sub, axis=0)
        sel_shape = (-1,) + (1,) * (rows.ndim - 1)
        for k in range(1, len(cache)):
            rows = jnp.where((cid == k).reshape(sel_shape),
                             jnp.take(cache[k], sub, axis=0), rows)
        return rows
    if mode == "contig":
        rows = jax.lax.dynamic_slice_in_dim(cache, idxs[0], idxs.shape[0], axis=0)
    else:
        rows = jnp.take(cache, idxs, axis=0)
    return rows


def gather_mode(n_rows: int, *, fixed_order: bool, n_devices: int) -> str:
    """Pick the fetch_rows strategy for an epoch: contiguous slices when the
    per-device order is consecutive (fixed-order epochs at any mesh size —
    local_perm emits arange there), plain gather otherwise. ``n_rows`` and
    ``n_devices`` no longer matter (measured: take has no size cliff under
    scan; the one-hot path lost to take even at 4096 rows and was removed)."""
    return "contig" if fixed_order else "take"


def stripe_order(n: int, ndev: int) -> np.ndarray:
    """Row order that places original row ``i`` on device ``i % ndev`` at
    local index ``i // ndev`` once block-sharded: device d's block is
    ``[d, d+ndev, d+2·ndev, ...]``. Rows past n (shard padding) wrap to the
    start of that device's stripe — real images, never indexed by the perms
    from :func:`local_perm`."""
    l = -(-max(n, 1) // ndev)
    rows = np.arange(ndev)[:, None] + np.arange(l)[None, :] * ndev
    return np.where(rows < max(n, 1), rows, rows % max(n, 1)).reshape(-1)


def _preferred_cache_layout(ndim: int):
    """Major-to-minor order the epoch programs want for uint8 image caches:
    channel major-most, (H, W) minor (the einsum augment tiles H/W on the
    MXU). Measured on v5e at 25.6k×286² rows: feeding this layout up front
    removes a full in-program relayout copy of the cache (2.64 GB with 1.4×
    tile padding per domain — a compile-time OOM at reference scale);
    device_put's default compact layout triggers that copy."""
    if ndim == 4:    # (N, H, W, C)
        return (3, 0, 1, 2)
    if ndim == 5:    # (N, 2, H, W, C) — paired pix2pix rows
        return (4, 0, 1, 2, 3)
    return None


# per-device buffers at/above the int32-bytes boundary crash the TPU runtime
# (bracketed on v5e: 1.77 GB tile-padded ok, 2.21 GB worker crash); chunk
# caches so every buffer stays safely below it
CHUNK_LIMIT_BYTES = 1_600_000_000


def padded_cache_nbytes(shape) -> int:
    """Tile-padded size of a uint8 image cache under the preferred layout:
    the (8, 128) tile on the two minor (H, W) dims rounds them up. (Slight
    overestimate vs the observed allocator numbers — fine for thresholds.)"""
    if len(shape) == 4:
        h, w = shape[1], shape[2]
    elif len(shape) == 5:
        h, w = shape[2], shape[3]
    else:
        return int(np.prod(shape))
    other = int(np.prod(shape)) // max(1, h * w)
    return other * (-(-h // 8) * 8) * (-(-w // 128) * 128)


def _chunk_local(arr: np.ndarray, ndev: int, n_chunks: int) -> list[np.ndarray]:
    """Split a striped (ndev·l, ...) cache into n_chunks caches of local-row
    ranges: chunk k holds every device's local rows [k·lk, (k+1)·lk), laid
    out block-per-device so each chunk shards P('data') like the original.
    Short tails pad with wrap rows from the same shard (never indexed —
    local_perm draws < the real row count)."""
    l = arr.shape[0] // ndev
    lk = -(-l // n_chunks)
    shards = arr.reshape(ndev, l, *arr.shape[1:])
    chunks = []
    for k in range(n_chunks):
        part = shards[:, k * lk:(k + 1) * lk]
        if part.shape[1] < lk:
            part = np.concatenate([part, shards[:, :lk - part.shape[1]]], axis=1)
        chunks.append(np.ascontiguousarray(part.reshape(ndev * lk, *arr.shape[1:])))
    return chunks


def flat_cache_nbytes(shape) -> int:
    """Device-resident size of a uint8 cache stored flat (FlatCache):
    per-row bytes round up to the 128-lane tile; the leading dim to the
    32-sublane tile. <0.1% padding at 256²-class rows (vs 1.35× tiled)."""
    n = shape[0]
    row = int(np.prod(shape[1:]))
    return (-(-n // 32) * 32) * (-(-row // 128) * 128)


def put_cache(cache_np: np.ndarray, mesh, *, process_local: bool = False,
              storage: str = "tiled"):
    """Device-put a host cache striped over the mesh (see stripe_order); at
    mesh size 1 the striping is the identity order.

    ``storage="flat"`` stores rows flattened to (N, row_bytes) — returned as
    a :class:`FlatCache` — trading the tiled layout's 1.35× padding for a
    per-batch post-gather reshape. Use when the tile-padded form exceeds the
    device-resident ceiling but the raw bytes do not (data.loader
    plan_cache_storage decides).

    Returns one array, or a tuple of equal-shape chunk arrays when a single
    per-device buffer would exceed CHUNK_LIMIT_BYTES tile-padded (runtime
    crash boundary — see fetch_rows). On TPU every buffer is then relaid on
    device into the epoch program's preferred layout
    (_preferred_cache_layout) via a donated identity jit — host→device
    transfers directly into custom layouts crash the runtime, so the
    transfer lands compact and the relayout happens in HBM (one ~ms copy per
    cache per run). GAN_TPU_CACHE_LAYOUT=off disables the relayout.

    Multi-controller pods (jax.process_count() > 1): arrays are assembled
    with ``jax.make_array_from_process_local_data`` (mesh.put_global).
    ``process_local=False`` expects the SAME full cache on every process;
    ``process_local=True`` expects only this process's rows, pre-ordered by
    ``mesh.process_stripe_rows`` — nothing ever holds the whole corpus."""
    import os

    ndev = mesh.size
    multiproc = jax.process_count() > 1
    if process_local and multiproc:
        n_local_dev = sum(1 for d in mesh.devices.flat
                          if d.process_index == jax.process_index())
        assert cache_np.shape[0] % max(1, n_local_dev) == 0, (
            f"process-local cache rows {cache_np.shape[0]} must divide over "
            f"{n_local_dev} local devices (use mesh.process_stripe_rows)")
        l = max(1, cache_np.shape[0] // max(1, n_local_dev))
        global_rows = l * ndev
    elif process_local:
        # Single controller: process_stripe_rows covered the whole mesh, so
        # the rows arrive already stripe-ordered and wrap-padded — re-striping
        # them (the else branch) would silently scramble the row→device
        # mapping. Same pod loader code runs unchanged on one process.
        assert cache_np.shape[0] % ndev == 0, (
            f"process-local cache rows {cache_np.shape[0]} must divide over "
            f"{ndev} devices (use mesh.process_stripe_rows)")
        l = max(1, cache_np.shape[0] // ndev)
        global_rows = None
    else:
        n = cache_np.shape[0]
        if ndev > 1:
            if n == 0:
                cache_np = np.zeros((ndev,) + cache_np.shape[1:], cache_np.dtype)
            else:
                cache_np = cache_np[stripe_order(n, ndev)]
        l = max(1, cache_np.shape[0] // ndev)
        global_rows = None

    sample_shape = cache_np.shape[1:]
    if storage == "flat":
        cache_np = cache_np.reshape(cache_np.shape[0], -1)
    size_fn = flat_cache_nbytes if storage == "flat" else padded_cache_nbytes
    per_shard = size_fn((l,) + cache_np.shape[1:])
    n_chunks = max(1, -(-per_shard // CHUNK_LIMIT_BYTES))
    if n_chunks > 1 and process_local and multiproc:
        # pod-scale chunking (e.g. the reference 512² corpus — 14.9 GB flat —
        # on an 8-device pod: ~1.9 GB/shard, over the single-buffer limit):
        # cache_np holds THIS process's device stripes concatenated
        # (process_stripe_rows order), so _chunk_local over the LOCAL stripe
        # count yields chunk k = every local device's rows [k·lk, (k+1)·lk)
        # — exactly this process's contribution to a global chunk of
        # lk·ndev rows, assembled below via make_array_from_process_local_
        # data with the per-chunk global row count. n_chunks and lk derive
        # from (l, shape) alone, identical on every process.
        parts = _chunk_local(cache_np, n_local_dev, n_chunks)
        global_rows = (parts[0].shape[0] // n_local_dev) * ndev
    else:
        # (n_chunks > 1 here implies a single-controller layout, where
        # global_rows is None and _chunk_local splits over all mesh stripes)
        parts = ([cache_np] if n_chunks == 1
                 else _chunk_local(cache_np, ndev, n_chunks))

    relayout = None
    m2m = None if storage == "flat" else _preferred_cache_layout(cache_np.ndim)
    if (m2m is not None and cache_np.dtype == np.uint8
            and mesh.devices.flat[0].platform == "tpu"
            and os.environ.get("GAN_TPU_CACHE_LAYOUT") != "off"):
        from jax.experimental.layout import Format, Layout
        fmt = Format(Layout(major_to_minor=m2m), batch_sharding(mesh))
        relayout = jax.jit(lambda a: a, out_shardings=fmt, donate_argnums=0)

    # transfers run on parallel tunnel streams (loader.pipelined_map — a
    # single h2d stream moves 26-65 MB/s on the axon stack, 2-4 concurrent
    # streams aggregate ~1.9×), halving reference-scale cache load time
    # (4.17 GB flat: 68 s serial). Ordered results; GAN_TPU_PUT_STREAMS=1
    # restores the serial baseline.
    from gan_tpu.data.loader import pipelined_map

    if storage == "flat":
        # column strips of FLAT_STRIP_BYTES so XLA's mini-gathers consume
        # parameters directly instead of materializing cache-sized slice
        # temps (see FLAT_STRIP_BYTES)
        r = cache_np.shape[1]
        offs = list(range(0, r, FLAT_STRIP_BYTES))
        jobs = [(p, lo) for lo in offs for p in parts]

        def _put_strip(job):
            p, lo = job
            return put_global(
                np.ascontiguousarray(p[:, lo:lo + FLAT_STRIP_BYTES]),
                batch_sharding(mesh), global_rows=global_rows)

        flat_arrs = list(pipelined_map(iter(jobs), _put_strip))
        strips = []
        for si in range(len(offs)):
            sl = flat_arrs[si * n_chunks:(si + 1) * n_chunks]
            strips.append(sl[0] if n_chunks == 1 else tuple(sl))
        return FlatCache(strips, sample_shape)

    def _put_part(p):
        arr = put_global(p, batch_sharding(mesh), global_rows=global_rows)
        return relayout(arr) if relayout is not None else arr

    out = list(pipelined_map(iter(parts), _put_part))
    return out[0] if n_chunks == 1 else tuple(out)


def rotation_plan(n_blocks: int, m_res: int, stride: int,
                  epoch: int) -> np.ndarray:
    """Slot→block map for rotating hybrid residency at ``epoch`` — a pure
    function of its arguments (replayed from epoch 0, a few thousand int ops
    at most), so FaultFence rewinds and ``--resume`` reconstruct exactly the
    partition an uninterrupted run had.

    Blocks cycle FIFO: each epoch the ``stride`` longest-resident slots swap
    their block with the head of the streamed queue. Over ``n_blocks/stride``
    epochs every block passes through residency in cyclic order, so any two
    blocks are eventually either co-resident (cyclic distance < m_res) or
    co-streamed (cyclic distance < n_blocks − m_res) — and since
    max(m_res, n_blocks − m_res) ≥ n_blocks/2 ≥ every minimal cyclic
    distance, ALL block pairs can share a partition at some epoch. That
    closes the frozen-partition deviation of non-rotating hybrid epochs
    (rows [0, n_res) never mixing with the tail) while uploading only
    ``stride`` blocks per epoch."""
    resident = np.arange(m_res, dtype=np.int64)
    if n_blocks <= m_res or stride <= 0 or m_res <= 0:
        return resident[:min(m_res, n_blocks)]
    from collections import deque
    streamed = deque(range(m_res, n_blocks))
    t = 0
    for _ in range(epoch):
        for _ in range(stride):
            slot = t % m_res
            incoming = streamed.popleft()
            streamed.append(int(resident[slot]))
            resident[slot] = incoming
            t += 1
    return resident


def update_cache_rows(cache, rows_np: np.ndarray, pos0: int, mesh):
    """Overwrite striped-cache positions [pos0, pos0 + k) of a FLAT device
    cache with ``rows_np`` (k, *sample_shape) — the hybrid-rotation refresh.
    ``pos0`` and ``k`` must be multiples of the mesh size so the write is a
    contiguous local-row range on every device (striping maps position p →
    device p % ndev, local p // ndev). Runs as one donated jitted
    dynamic-update per strip chunk (compiled once per shape); returns the
    updated FlatCache (old buffers donated away)."""
    assert isinstance(cache, FlatCache), "rotation refresh targets FlatCache"
    ndev = mesh.size
    k = rows_np.shape[0]
    assert pos0 % ndev == 0 and k % ndev == 0, (pos0, k, ndev)
    flat = rows_np.reshape(k, -1)
    if ndev > 1:
        flat = flat[stripe_order(k, ndev)]
    local0, lrows = pos0 // ndev, k // ndev
    new_strips = []
    for si, lo in enumerate(range(0, flat.shape[1], FLAT_STRIP_BYTES)):
        part = np.ascontiguousarray(flat[:, lo:lo + FLAT_STRIP_BYTES])
        strip = cache.strips[si]
        if isinstance(strip, tuple):           # row-chunked strip
            lk = strip[0].shape[0] // ndev     # local rows per chunk
            out = []
            for c, chunk in enumerate(strip):
                a, b = max(local0, c * lk), min(local0 + lrows, (c + 1) * lk)
                if a >= b:
                    out.append(chunk)
                    continue
                sub = part.reshape(ndev, lrows, -1)[:, a - local0:b - local0]
                out.append(_strip_write(chunk, sub.reshape((b - a) * ndev, -1),
                                        a - c * lk, mesh))
            new_strips.append(tuple(out))
        else:
            new_strips.append(_strip_write(strip, part, local0, mesh))
    return FlatCache(new_strips, cache.sample_shape)


_STRIP_WRITERS: dict = {}


def _strip_write(strip, rows_host: np.ndarray, local0: int, mesh):
    """shard_map'd donated row-range write into one strip buffer. ``rows_host``
    is device-major ((ndev·m, w): device d's rows at [d·m, (d+1)·m)); the
    write offset is a traced scalar so one compile serves every slot."""
    key = (mesh, strip.shape, strip.dtype, rows_host.shape)
    fn = _STRIP_WRITERS.get(key)
    if fn is None:
        def write(s, r, off):
            return jax.lax.dynamic_update_slice_in_dim(s, r, off[0], axis=0)

        sm = jax.shard_map(write, mesh=mesh,
                           in_specs=(P(DATA_AXIS), P(DATA_AXIS), P()),
                           out_specs=P(DATA_AXIS), check_vma=False)
        fn = jax.jit(sm, donate_argnums=0)
        _STRIP_WRITERS[key] = fn
    rows_dev = put_global(rows_host, batch_sharding(mesh))
    return fn(strip, rows_dev, jnp.asarray([local0], jnp.int32))


def local_perm(n: int, *, ndev: int, n_steps: int,
               per_dev_batch: int) -> np.ndarray:
    """(n_steps, ndev * per_dev_batch) int32 of *local* cache indices for a
    FIXED-ORDER epoch over a striped cache (put_cache).

    Column block d (width per_dev_batch) indexes device d's stripe. Because
    stripes interleave original rows, the arange-everywhere order makes
    global step s draw exactly original rows [s·B, (s+1)·B) — the
    reference's fixed epoch order (pix2pix.py:147 shuffles once at split
    time, never per epoch) at ANY mesh size. Per-epoch SHUFFLED draws (the
    CycleGAN semantics) go through :func:`shuffled_stripe_perm`, which also
    handles windowed --buffer-size semantics and tail coverage.

    epoch_plan guarantees n_steps·per_dev_batch ≤ floor(n/ndev) ≤ every
    device's real-row count, so wrap-padding rows are never drawn.
    """
    need = n_steps * per_dev_batch
    cols = []
    for d in range(ndev):
        real = n // ndev + (1 if d < n % ndev else 0)
        assert need <= max(real, 1), (
            f"need {need} rows from a {real}-row stripe (n={n}, ndev={ndev})")
        cols.append(np.arange(need).reshape(n_steps, per_dev_batch))
    return np.concatenate(cols, axis=1).astype(np.int32)


def shuffled_stripe_perm(n: int, *, ndev: int, n_steps: int,
                         per_dev_batch: int, buffer_size: int,
                         rng: np.random.Generator
                         ) -> tuple[np.ndarray, np.ndarray]:
    """Shuffled-epoch DP sampling over a striped cache (CycleGAN's
    ``reshuffle_each_iteration=True`` at mesh size > 1, cycle_gan.py:140-150).

    Returns ``(perm, leftover)``:
      * ``perm`` — (n_steps, ndev · per_dev_batch) local indices as in
        :func:`local_perm`, but each device's draw order comes from
        :func:`epoch_perm` over its OWN stripe, so ``--buffer-size`` windowed
        semantics apply per stripe (full uniform permutation at the default
        buffer ≥ stripe length).
      * ``leftover`` — the GLOBAL rows (original indices; device d local j ↔
        global j·ndev + d) the full steps did NOT draw, pre-shuffled across
        devices. The zip-tail remainder draws from this, so one epoch visits
        each row at most once — exactly once for the shorter domain, matching
        the reference's exactly-once pass at any mesh size.
    """
    need = n_steps * per_dev_batch
    cols, leftovers = [], []
    for d in range(ndev):
        real = n // ndev + (1 if d < n % ndev else 0)
        assert need <= max(real, 1), (
            f"need {need} rows from a {real}-row stripe (n={n}, ndev={ndev})")
        order = epoch_perm(max(real, 1), buffer_size, rng)
        cols.append(order[:need].reshape(n_steps, per_dev_batch))
        leftovers.append(order[need:real].astype(np.int64) * ndev + d)
    perm = np.concatenate(cols, axis=1).astype(np.int32)
    leftover = (np.concatenate(leftovers) if leftovers
                else np.empty(0, np.int64))
    rng.shuffle(leftover)  # unbias the tail draw across device stripes
    return perm, leftover


def epoch_rng(seed: int, epoch: int, stream: int = 0) -> np.random.Generator:
    """Host RNG for one epoch's shuffle draws — a pure function of (seed,
    epoch, stream), NOT one stream consumed across epochs. That purity is
    load-bearing for recovery: a FaultFence rewind re-runs destroyed epochs
    and ``--resume`` restarts mid-run, and both must reproduce exactly the
    shuffle orders an uninterrupted run would have drawn (the reference has
    no such constraint — its tf.data shuffles are unseeded,
    cycle_gan.py:140-150). ``stream`` separates the train (0) and val (1)
    draws so either epoch half can be reordered/overlapped without
    perturbing the other's orders."""
    return np.random.default_rng(
        np.random.SeedSequence([seed % (2**32), epoch, stream]))


def epoch_perm(n: int, buffer_size: int, rng: np.random.Generator) -> np.ndarray:
    """Epoch-order permutation honoring ``--buffer-size``: tf.data's windowed
    shuffle (cycle_gan.py:140-150 ``shuffle(buffer_size,
    reshuffle_each_iteration=True)``) — a buffer of ``buffer_size`` elements
    is kept, each output drawn uniformly from it and replaced by the next
    stream element. At buffer_size ≥ n (the 99999 default exceeds the
    reference dataset) this IS a full uniform permutation and the fast path
    is taken."""
    if buffer_size >= n:
        return rng.permutation(n)
    b = min(buffer_size, n)
    buf = np.arange(b)
    out = np.empty(n, np.int64)
    # The buffer sizes (draw bounds) are deterministic: b while the stream
    # still refills it, then b-1, ..., 1 as it drains — so every random draw
    # can be made in ONE vectorized call; only the cheap buffer chase stays
    # a Python loop (it is inherently sequential: each draw depends on the
    # buffer contents the previous draws produced).
    ends = np.concatenate([np.full(n - b, b, np.int64), np.arange(b, 0, -1)])
    js = rng.integers(0, ends)
    nxt = b
    for i in range(n - b):
        j = js[i]
        out[i] = buf[j]
        buf[j] = nxt
        nxt += 1
    for i in range(n - b, n):
        j = js[i]
        out[i] = buf[j]
        buf[j] = buf[ends[i] - 1]
    return out


def epoch_plan(n: int, batch_size: int, ndev: int) -> tuple[int, int, int]:
    """(n_steps, per_dev_batch, remainder).

    n_steps full global batches run inside the sharded epoch program; the
    ``remainder`` partial batch (tf.data batches without dropping —
    pix2pix.py:156) runs as one replicated step outside it, at every mesh
    size — so DP covers every sample and small val sets still yield finite
    metrics.
    """
    if ndev > 1:
        assert batch_size % ndev == 0, (
            f"global batch {batch_size} must divide across {ndev} devices")
    return n // batch_size, batch_size // ndev, n % batch_size


def losses_to_dict(losses_np: np.ndarray, keys) -> dict:
    """(n_steps, K) per-step losses → {key: [per-step floats]} (the reference
    accumulates per-mini-batch loss lists, pix2pix.py:276-279)."""
    return {k: [float(v) for v in losses_np[:, i]] for i, k in enumerate(keys)}
