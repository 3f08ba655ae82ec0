"""Measure row-gather strategies on a reference-scale device cache.

The round-1 numbers (train/loop.py docstring) showed jnp.take at 4.1 s per
128-row gather on a big cache vs 2 ms for one-hot/contig — but one-hot was
capped at 4096 rows. This benchmarks the candidate fixes at 25.6k rows
(reference scale, SURVEY §6: ~25.4k train images):

  * take/step      — per-step jnp.take gather (the current cliff path)
  * onehot/step    — per-step one-hot selector matmul over the FULL cache
  * take/epoch     — one full-cache permutation per epoch via jnp.take,
                     then contiguous slices per step
  * onehot/epoch   — full-cache permutation via one-hot in 4096-row output
                     chunks, then contiguous slices per step

Timings are whole scans (many steps under one jit) — per-dispatch timing over
the axon tunnel is meaningless (CLAUDE.md).
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

N = 25_600          # rows (reference-scale train split)
ROW = (2, 286, 286, 1)   # pix2pix train pair at 256²
B = 128             # per-step batch
STEPS = 20


def _force(out):
    # block_until_ready over the axon tunnel can return early; a host fetch
    # of a scalar leaf is the only reliable barrier. Callables return either
    # a scalar or (big_array, scalar_checksum); fetch the scalar.
    return float(np.asarray(jax.tree_util.tree_leaves(out)[-1]))


def timed(fn, *args, reps=3):
    _force(fn(*args))
    t0 = time.perf_counter()
    for _ in range(reps):
        _force(fn(*args))
    return (time.perf_counter() - t0) / reps


def onehot_rows(cache, idxs):
    n = cache.shape[0]
    sel = (idxs[:, None] == jnp.arange(n)[None, :]).astype(jnp.bfloat16)
    flat = cache.reshape(n, -1).astype(jnp.bfloat16)
    return (sel @ flat).reshape((idxs.shape[0],) + cache.shape[1:])


def main():
    rng = np.random.default_rng(0)
    cache_np = rng.integers(0, 255, (N,) + ROW, dtype=np.uint8)
    cache = jax.device_put(cache_np)
    perm = jax.device_put(rng.permutation(N).astype(np.int32))
    step_idxs = perm[: STEPS * B].reshape(STEPS, B)
    print(f"cache {cache.nbytes / 1e9:.2f} GB, {N} rows x {np.prod(ROW)/1e3:.0f} KB")

    @jax.jit
    def scan_take(cache, step_idxs):
        def body(acc, idxs):
            rows = jnp.take(cache, idxs, axis=0)
            return acc + rows.astype(jnp.float32).sum(), None
        return jax.lax.scan(body, 0.0, step_idxs)[0]

    @jax.jit
    def scan_contig(cache, starts):
        def body(acc, lo):
            rows = jax.lax.dynamic_slice_in_dim(cache, lo, B, axis=0)
            return acc + rows.astype(jnp.float32).sum(), None
        return jax.lax.scan(body, 0.0, starts)[0]

    @jax.jit
    def scan_onehot(cache, step_idxs):
        def body(acc, idxs):
            rows = onehot_rows(cache, idxs)
            return acc + rows.astype(jnp.float32).sum(), None
        return jax.lax.scan(body, 0.0, step_idxs)[0]

    def _checksum(arr):
        return arr[::997].astype(jnp.float32).sum()

    @jax.jit
    def permute_take(cache, perm):
        out = jnp.take(cache, perm, axis=0)
        return out, _checksum(out)

    @jax.jit
    def permute_onehot(cache, perm):
        chunks = [onehot_rows(cache, perm[lo:lo + 4096]).astype(jnp.uint8)
                  for lo in range(0, N, 4096)]
        out = jnp.concatenate(chunks, axis=0)
        return out, _checksum(out)

    t = timed(scan_take, cache, step_idxs)
    print(f"take/step    : {t / STEPS * 1e3:8.1f} ms/step")
    starts = jnp.arange(STEPS, dtype=jnp.int32) * B
    t = timed(scan_contig, cache, starts)
    print(f"contig/step  : {t / STEPS * 1e3:8.1f} ms/step")
    t = timed(scan_onehot, cache, step_idxs)
    print(f"onehot/step  : {t / STEPS * 1e3:8.1f} ms/step")
    t = timed(permute_take, cache, perm)
    print(f"take/epoch   : {t * 1e3:8.1f} ms/epoch-permute")
    t = timed(permute_onehot, cache, perm)
    print(f"onehot/epoch : {t * 1e3:8.1f} ms/epoch-permute")


if __name__ == "__main__":
    main()
