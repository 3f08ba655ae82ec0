"""Pix2Pix trainer: U-Net generator + conditional 70×70 PatchGAN.

Reference mapping (pix2pix.py):
  * __init__ (:26-32) — 1 generator (batch norm, fixed shape), 1 conditional
    discriminator, 2 Adam optimizers.
  * train_step (:190-218) — G(x); D(x,y); D(x,G(x)); gen adversarial +
    λ·secondary loss; disc BCE·0.5; two independent gradient sets. Here the
    two GradientTapes become ONE fused backward over a combined scalar with
    stop-gradient partitioning (losses.sg_tree): ``gen_total`` sees sg'd disc
    params, ``disc_loss`` sees sg'd fake images, so ∂combined/∂θ_G ≡
    ∂gen_total/∂θ_G and ∂combined/∂θ_D ≡ ∂disc_loss/∂θ_D exactly — same
    gradients as the reference, half the backward work, one XLA program.
  * fit (:248-323) — epoch loop; per-epoch mean of per-mini-batch losses;
    val pass through the step with no update (dropout + batch-stats stay on:
    SURVEY §2.10-Q2); checkpoint + sample image every 5 epochs; epoch prints.
    The per-step ``.numpy()`` host syncs are replaced by a device-side
    lax.scan per epoch (train/loop.py).
  * predict (:325-339) — per-image 3-panel grids.

Training-mode semantics everywhere (model called with training=True even at
val/test — SURVEY §2.10-Q2/Q3): dropout active, batch-norm batch stats.
"""

from __future__ import annotations

import math
import os
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from gan_tpu.config import Pix2PixConfig
from gan_tpu.data.augment import normalize_batch, paired_jitter_batch
from gan_tpu.losses import (PIX2PIX_LOSS_KEYS, discriminator_loss, empty_losses,
                            pix2pix_generator_loss, sg_tree)
from gan_tpu.models import PatchGANDiscriminator, UNetGenerator
from gan_tpu.parallel.mesh import (DATA_AXIS, make_mesh, put_global,
                                   replicated_sharding, shard_batch)
from gan_tpu.train import loop
from gan_tpu.train.checkpoint import CheckpointManager
from gan_tpu.train.optim import adam
from gan_tpu.utils.grids import save_image_grid


def raw_png_names(names, count: int) -> list[str]:
    """Unique .png names for the raw predictions: source stems, with a
    counter suffix when two sources differ only by extension (img.jpg and
    img.png both pass list_images' substring filter and would otherwise
    silently overwrite each other)."""
    if names is None:
        return [f"img{i}.png" for i in range(count)]
    out, seen = [], {}
    for n in names:
        stem = os.path.splitext(os.path.basename(n))[0]
        k = seen.get(stem, 0)
        seen[stem] = k + 1
        out.append((stem if k == 0 else f"{stem}__{k}") + ".png")
    return out


def _write_raw(preds: np.ndarray, output_path: str, png_names) -> None:
    """Write bare generated images (fp32 [-1,1] → uint8 PNGs) to
    prediction_images_raw/ under the given (pre-deduplicated) names."""
    from PIL import Image

    raw_path = os.path.join(output_path, "prediction_images_raw")
    os.makedirs(raw_path, exist_ok=True)
    u8 = np.clip((preds + 1.0) * 127.5, 0, 255).astype(np.uint8)
    for i in range(u8.shape[0]):
        arr = u8[i, :, :, 0] if u8.shape[-1] == 1 else u8[i]
        Image.fromarray(arr).save(os.path.join(raw_path, png_names[i]))


def generator_depth(img_size: int) -> int:
    """The reference always builds 8 down blocks (base_gan.py:179-188); cap
    by log2(img_size) so tiny test images still bottleneck at 1×1."""
    return min(8, int(math.log2(img_size)))


def use_remat(config, n_devices: int = 1) -> bool:
    """Gradient checkpointing usually costs throughput, so ``auto`` enables
    it only beyond the largest per-device activation footprint measured to
    fit v5e HBM without it: 256 "256²-image equivalents" (= 512² batch 64,
    13.3 GB compile-time peak, trains rematerialization-free) — EXCEPT at
    small 512²+ per-device batches, where remat measured decisively FASTER
    (512² batch 8: 210 vs 130 img/s/chip; batch 16 flips back, 259 vs 280 —
    benchmarks/results/remat_frontier.json), so ``auto`` turns it on there
    too."""
    if config.remat in ("on", "off"):
        return config.remat == "on"
    per_dev = max(1, config.batch_size // max(1, n_devices))
    if config.img_size >= 512 and per_dev <= 8:
        return True
    footprint = per_dev * (config.img_size / 256) ** 2  # 256²-image equivalents
    return footprint > 256


class Pix2PixTrainer:
    # per-step cost model for epoch segmentation (loop.seg_max_steps):
    # measured v5e 256² batch-128 steps run ~87 ms (1,473 img/s) → ~0.7
    # ms/img; 1.0 is the conservative slope, the 25 ms floor covers
    # small-batch fixed costs. Keeps the batch-128 full-corpus epoch
    # (198 steps, ~17 s) a single program while capping every config near
    # loop.SEG_TARGET_SECONDS.
    SEG_T_MIN_MS = 25.0
    SEG_T_IMG_MS = 1.0

    def __init__(self, config: Pix2PixConfig, *, mesh=None):
        self.config = config
        c = config.n_channels
        self.mesh = mesh if mesh is not None else make_mesh(
            self._auto_devices(config))
        self.gen = UNetGenerator(out_channels=c, norm="batch",
                                 depth=generator_depth(config.img_size),
                                 remat=use_remat(config, self.mesh.size))
        self.disc = PatchGANDiscriminator(norm="batch", target=True)
        self.tx_gen = adam(config.learning_rate, config.beta_1, config.beta_2)
        self.tx_disc = adam(config.learning_rate, config.beta_1, config.beta_2)

        key = jax.random.PRNGKey(config.seed)
        k_gen, k_disc = jax.random.split(key)
        params = {"gen": self.gen.init(k_gen, c),
                  "disc": self.disc.init(k_disc, c)}
        opt_states = {"gen": self.tx_gen.init(params["gen"]),
                      "disc": self.tx_disc.init(params["disc"])}
        rep = replicated_sharding(self.mesh)
        self.params = put_global(params, rep)
        self.opt_states = put_global(opt_states, rep)

        self._bn_axis = DATA_AXIS if (config.bn_cross_replica == "true"
                                      and self.mesh.size > 1) else None
        self._epoch_fns: dict = {}
        self._stream_fns: dict = {}
        self._sample_fn = None
        self._batch_fn = None
        self._sample_calls = 0   # fresh dropout key per generate() call
        # persistent jit wrappers for the per-epoch remainder batch (prep +
        # step in one program, replicated over the mesh — runs at any size).
        # These retrace per distinct tail SHAPE — deliberate: a run sees one
        # tail size (N mod batch is constant across epochs), and the obvious
        # fix (pad to a bucket + mask the loss means) would change the loss
        # VALUES, because training-mode-everywhere BatchNorm (SURVEY §2.10-Q2)
        # computes batch stats over whatever rows are present — padding rows
        # would leak into every normalized activation, breaking parity with
        # the reference's exact-size tail batch (pix2pix.py:156).
        self._rem_train = jax.jit(lambda p, o, u8, k: self._rem_step(p, o, u8, k, True))
        self._rem_eval = jax.jit(lambda p, o, u8, k: self._rem_step(p, o, u8, k, False))

    @staticmethod
    def _auto_devices(config: Pix2PixConfig) -> int:
        from gan_tpu.parallel.mesh import default_devices
        n = config.num_devices or len(default_devices())
        while config.batch_size % n:
            n -= 1
        return n

    # ------------------------------------------------------------------ math
    def _losses(self, params, x, y, drop_rng, bn_axis=None):
        """``bn_axis``: mesh axis for cross-replica BN stats — set only inside
        the shard_map'd epoch/step programs; replicated steps (remainder) pass
        None, where per-device stats ARE the full-batch stats."""
        cfg = self.config
        dtype = cfg.compute_dtype
        fake = self.gen.apply(params["gen"], x, rng=drop_rng,
                              compute_dtype=dtype, bn_axis_name=bn_axis)
        # generator view: disc params stop-gradiented
        d_gen_logits = self.disc.apply(sg_tree(params["disc"]), x, fake,
                                       compute_dtype=dtype, bn_axis_name=bn_axis)
        gen_total, gen_gan, gen_sec = pix2pix_generator_loss(
            d_gen_logits, fake, y, lam=float(cfg.lam), kind=cfg.generator_loss)
        # discriminator view: fake stop-gradiented
        d_real_logits = self.disc.apply(params["disc"], x, y,
                                        compute_dtype=dtype, bn_axis_name=bn_axis)
        d_fake_logits = self.disc.apply(params["disc"], x, jax.lax.stop_gradient(fake),
                                        compute_dtype=dtype, bn_axis_name=bn_axis)
        disc = discriminator_loss(d_real_logits, d_fake_logits, 0.5)
        combined = gen_total + disc
        return combined, jnp.stack([gen_total, gen_gan, gen_sec, disc])

    def _train_step(self, params, opt_states, batch, key, *, axis_name=None,
                    bn_axis=None):
        x, y = batch
        grads, losses = jax.grad(self._losses, has_aux=True)(
            params, x, y, key, bn_axis)
        if axis_name is not None:
            grads = jax.lax.pmean(grads, axis_name)
        up_g, os_g = self.tx_gen.update(grads["gen"], opt_states["gen"], params["gen"])
        up_d, os_d = self.tx_disc.update(grads["disc"], opt_states["disc"], params["disc"])
        params = {"gen": jax.tree_util.tree_map(lambda p, u: p + u, params["gen"], up_g),
                  "disc": jax.tree_util.tree_map(lambda p, u: p + u, params["disc"], up_d)}
        return params, {"gen": os_g, "disc": os_d}, losses

    def _eval_step(self, params, opt_states, batch, key, *, bn_axis=None):
        x, y = batch
        _, losses = self._losses(params, x, y, key, bn_axis)
        return losses

    # --------------------------------------------------------------- extract
    def _prep(self, batch_u8, key, training: bool):
        """uint8 rows → model batch: fused jitter (train) or normalize (eval)."""
        if training:
            return paired_jitter_batch(batch_u8, key,
                                       img_size=self.config.img_size,
                                       dtype=self.config.compute_dtype)
        pair = normalize_batch(batch_u8, self.config.compute_dtype)
        return pair[:, 0], pair[:, 1]

    def _rem_step(self, params, opt_states, batch_u8, key, training: bool):
        k_data, k_step = jax.random.split(key)
        batch = self._prep(batch_u8, k_data, training)
        if training:
            return self._train_step(params, opt_states, batch, k_step)
        return self._eval_step(params, opt_states, batch, k_step)

    def _extract_train(self, cache, idxs, key, mode: str = "take"):
        return self._prep(loop.fetch_rows(cache, idxs, mode), key, True)

    def _extract_eval(self, cache, idxs, key, mode: str = "take"):
        return self._prep(loop.fetch_rows(cache, idxs, mode), key, False)

    # ----------------------------------------------------------------- epoch
    def _get_epoch_fn(self, training: bool, mode: str):
        cache_key = (training, mode)
        if cache_key not in self._epoch_fns:
            axis = DATA_AXIS if self.mesh.size > 1 else None
            bn = self._bn_axis
            if training:
                extract = lambda c, i, k: self._extract_train(c, i, k, mode)
                step = lambda p, o, b, k: self._train_step(p, o, b, k,
                                                           axis_name=axis,
                                                           bn_axis=bn)
                fn = loop.make_cached_epoch(self.mesh, extract, step,
                                            training=True)
            else:
                extract = lambda c, i, k: self._extract_eval(c, i, k, mode)
                step = lambda p, o, b, k: self._eval_step(p, o, b, k, bn_axis=bn)
                fn = loop.make_cached_epoch(self.mesh, extract, step,
                                            training=False)
            self._epoch_fns[cache_key] = fn
        return self._epoch_fns[cache_key]

    def _run_remainder(self, rows_u8: np.ndarray, epoch_key, n_steps: int,
                       training: bool):
        """One replicated step over the partial final batch (tf.data batches
        without dropping, pix2pix.py:156) — runs at ANY mesh size, so DP
        covers every sample and val sets smaller than the global batch still
        produce finite metrics. RNG continues the epoch runner's stream
        (step index = n_steps, device stream 0)."""
        arr = put_global(np.ascontiguousarray(rows_u8),
                         replicated_sharding(self.mesh))
        key = jax.random.fold_in(jax.random.fold_in(epoch_key, n_steps), 0)
        if training:
            self.params, self.opt_states, losses = self._rem_train(
                self.params, self.opt_states, arr, key)
        else:
            losses = self._rem_eval(self.params, self.opt_states, arr, key)
        return np.asarray(losses)[None]

    def _run_epoch(self, cache_dev, cache, epoch_key, *, training: bool,
                   fixed_order: bool, rng: np.random.Generator):
        """One dataset pass over the device-resident cache; ``cache`` is the
        host uint8 array (remainder rows are fed from it). Returns
        (n_steps + maybe 1, 4) per-step losses."""
        ndev = self.mesh.size
        n = cache.shape[0]
        n_steps, b_loc, rem = loop.epoch_plan(n, self.config.batch_size, ndev)
        mode = loop.gather_mode(n, fixed_order=fixed_order, n_devices=ndev)
        all_losses = []
        if n_steps > 0:
            assert fixed_order, (
                "Pix2Pix epochs are fixed-order (reference quirk Q4); "
                "shuffled DP draws go through loop.shuffled_stripe_perm")
            perm = loop.local_perm(n, ndev=ndev, n_steps=n_steps,
                                   per_dev_batch=b_loc)
            fn = self._get_epoch_fn(training, mode)
            seg = loop.seg_max_steps(b_loc, self.config.img_size, self.mesh,
                                     t_min_ms=self.SEG_T_MIN_MS,
                                     t_img_ms=self.SEG_T_IMG_MS)
            if training:
                self.params, self.opt_states, losses = loop.run_epoch_segments(
                    fn, self.params, self.opt_states, cache_dev, perm,
                    epoch_key, max_steps=seg)
            else:
                _, _, losses = loop.run_epoch_segments(
                    fn, self.params, self.opt_states, cache_dev, perm,
                    epoch_key, max_steps=seg)
            all_losses.append(np.asarray(losses))
        if rem:
            all_losses.append(self._run_remainder(cache[n - rem:], epoch_key,
                                                  n_steps, training))
        if not all_losses:
            return np.zeros((0, len(PIX2PIX_LOSS_KEYS)), np.float32)
        return np.concatenate(all_losses, axis=0)

    def _get_stream_fn(self, training: bool):
        if training not in self._stream_fns:
            prep = lambda u8, k: self._prep(u8, k, training)
            axis = DATA_AXIS if self.mesh.size > 1 else None
            bn = self._bn_axis
            if training:
                step = lambda p, o, b, k: self._train_step(p, o, b, k,
                                                           axis_name=axis,
                                                           bn_axis=bn)
            else:
                step = lambda p, o, b, k: self._eval_step(p, o, b, k, bn_axis=bn)
            self._stream_fns[training] = loop.make_sharded_step(
                self.mesh, prep, step, training=training)
        return self._stream_fns[training]

    def _stream_batches(self, cache, *, start_row: int = 0, depth: int = 2):
        """Prefetched (step, device_array, is_full) stream over ``cache``
        rows [start_row:) — the host half of a streamed epoch. Batches are
        assembled in a prefetch thread (starts at CALL time — hybrid epochs
        lean on that to transfer the tail during the resident scan) and
        ``device_put`` on several parallel tunnel streams (loader.
        pipelined_map — single-stream h2d is the streamed path's bottleneck
        and 2-4 streams aggregate ~1.9×). Full batches are stripe-reordered
        so device d's block holds rows ≡ d (mod ndev), matching put_cache
        striping: per-sample augment/dropout RNG pairing and per-device BN
        stats then equal the cached epoch's at any per-device batch size
        (see make_sharded_step)."""
        from gan_tpu.data.loader import (iter_uint8_batches,
                                         prefetched_put_stream)

        b = self.config.batch_size
        ndev = self.mesh.size
        stripe = loop.stripe_order(b, ndev) if ndev > 1 else None
        start_step = start_row // b
        order = (None if start_row == 0
                 else np.arange(start_row, cache.shape[0]))

        def assemble():
            for step, batch_u8 in enumerate(iter_uint8_batches(cache, b, order),
                                            start=start_step):
                if batch_u8.shape[0] == b and batch_u8.shape[0] % ndev == 0:
                    if stripe is not None:
                        batch_u8 = batch_u8[stripe]
                    yield step, np.ascontiguousarray(batch_u8), True
                else:
                    yield step, batch_u8, False

        def put(item):
            step, arr, full = item
            return (step, shard_batch(arr, self.mesh) if full else arr, full)

        return prefetched_put_stream(assemble(), put, depth=depth)

    def _consume_stream(self, batches, epoch_key, training: bool) -> list:
        """Run the sharded DP step over prefetched (step, arr, full) items;
        the partial tail batch runs replicated. Returns per-step losses."""
        fn = self._get_stream_fn(training)
        losses = []
        for step, arr, full in batches:
            if full:
                key = jax.random.fold_in(epoch_key, step)
                if training:
                    self.params, self.opt_states, l = fn(
                        self.params, self.opt_states, arr, key)
                else:
                    l = fn(self.params, self.opt_states, arr, key)
                losses.append(l)
            else:
                losses.append(self._run_remainder(arr, epoch_key, step,
                                                  training))
        return losses

    def _run_epoch_streaming(self, cache, epoch_key, *, training: bool,
                             batches=None):
        """Host-streamed epoch: batches come from host RAM
        (``--device-cache off`` / cache too big for HBM) or straight from
        files (a data.loader.FileCache — corpora bigger than host RAM,
        replacing tf.data's disk streaming, pix2pix.py:155-163). Full batches
        are sharded over the mesh and stepped through the same psum'd DP step
        as the cached path (identical RNG streams — see make_sharded_step);
        the partial tail batch runs replicated. Throughput is bound by
        host→device bandwidth (~65 MB/s over the axon tunnel ⇒ ~400 img/s
        ceiling at 256² — benchmarks/transfer_bench.py); prefer the flat or
        hybrid device caches whenever rows fit.

        ``batches``: a pre-started stream from :meth:`_stream_batches` —
        fit() creates the VAL stream before dispatching the train epoch so
        val transfers overlap train compute (the batches and their RNG keys
        are functions of (cache, step) only, so results are bit-equal to the
        serial form)."""
        losses = self._consume_stream(
            self._stream_batches(cache) if batches is None else batches,
            epoch_key, training)
        if not losses:
            return np.zeros((0, len(PIX2PIX_LOSS_KEYS)), np.float32)
        return np.concatenate([np.asarray(l).reshape(1, -1) for l in losses])

    def _val_stream(self, val_cache):
        """Pre-started streamed-val producer with a depth that lets the whole
        val set transfer during the train epoch (loader.val_stream_depth)."""
        from gan_tpu.data.loader import val_stream_depth
        row = int(np.prod(val_cache.shape[1:]))
        return self._stream_batches(
            val_cache, depth=val_stream_depth(val_cache.shape[0],
                                             self.config.batch_size, row))

    def _run_epoch_hybrid(self, resident_dev, resident_host, cache, epoch_key,
                          *, training: bool, rng: np.random.Generator):
        """Resident-prefix + streamed-tail epoch for corpora beyond the flat
        device budget (e.g. the reference 512² corpus: 14.9 GB flat).

        Rows [0, n_res) — n_res a multiple of the global batch — live
        device-resident (FlatCache) and run as the usual scanned epoch;
        rows [n_res, N) stream from host. Because Pix2Pix epochs are
        fixed-order (the reference shuffles once at split time,
        pix2pix.py:147), batch composition and per-step RNG streams are
        EXACTLY a fully cached epoch's: batches s < n_res/B come from the
        scan, later ones from the stream, the partial tail runs replicated.
        The tail producer starts before the scan is dispatched, so its
        host→device transfers (the streamed path's bottleneck) overlap the
        scan's device compute; epoch wall-clock ≈ max(compute,
        tail-transfer) instead of their sum."""
        n_res = resident_host.shape[0]
        assert n_res % self.config.batch_size == 0
        tail = self._stream_batches(cache, start_row=n_res,
                                    depth=int(os.environ.get(
                                        "GAN_TPU_HYBRID_DEPTH", "16")))
        head = self._run_epoch(resident_dev, resident_host, epoch_key,
                               training=training, fixed_order=True, rng=rng)
        tail_losses = self._consume_stream(tail, epoch_key, training)
        parts = ([head] if head.shape[0] else []) + \
            [np.asarray(l).reshape(1, -1) for l in tail_losses]
        if not parts:
            return np.zeros((0, len(PIX2PIX_LOSS_KEYS)), np.float32)
        return np.concatenate(parts, axis=0)

    # Hybrid epochs keep LESS resident than the pure-flat ceiling: the
    # streamed tail's parallel device_puts and the streamed-step executable
    # share the argument-bytes fault budget with the resident cache (the
    # CycleGAN bracketing story — cyclegan_trainer.HYBRID_RESIDENT_MARGIN),
    # so both trainers reserve the same 20% headroom.
    HYBRID_RESIDENT_MARGIN = 0.8

    def _hybrid_resident_rows(self, cache, reserved_bytes: int = 0) -> int:
        """Largest batch-multiple row prefix of ``cache`` that fits the flat
        device budget (minus ``reserved_bytes`` taken by other cached
        groups); 0 disables the hybrid path (pure streaming)."""
        from gan_tpu.data.loader import flat_cache_budget
        budget = flat_cache_budget(self.mesh) * self.mesh.size - reserved_bytes
        budget = int(budget * self.HYBRID_RESIDENT_MARGIN)
        # per-row flat bytes from the single source of truth (128-lane
        # rounding lives in loop.flat_cache_nbytes; 32 rows amortize its
        # leading-dim rounding away)
        row = loop.flat_cache_nbytes((32,) + cache.shape[1:]) // 32
        b = self.config.batch_size
        if budget <= 0 or row <= 0:
            return 0
        return max(0, min(int(budget // row), cache.shape[0]) // b * b)

    def _storage_plan(self, *caches) -> list[str]:
        """Per-cache device-storage plan ('tiled'|'flat'|'stream') —
        data.loader.plan_cache_storage; FileCache corpora always stream."""
        from gan_tpu.data.loader import FileCache, plan_cache_storage
        groups = [None if isinstance(c, FileCache) else [c.shape]
                  for c in caches]
        return plan_cache_storage(groups, self.mesh, self.config.device_cache)

    # ---------------------------------------------------------------- public
    def fit(self, train_cache: np.ndarray, val_cache: np.ndarray,
            test_cache: np.ndarray, output_path: str,
            checkpoint_manager: Optional[CheckpointManager] = None,
            start_epoch: int = 0):
        """Epoch loop — ref pix2pix.py:248-323. train/val caches are uint8
        arrays from gan_tpu.data.pipeline (train: (N,2,S+30,S+30,C); val:
        (N,2,S,S,C)) or data.loader.FileCache for bigger-than-RAM corpora
        (always host-streamed); test_cache is always a small ndarray.
        Returns (train_cost_functions, val_cost_functions)."""
        cfg = self.config
        print("\nTraining...\n", flush=True)

        example = normalize_batch(test_cache[:1].astype(np.float32))
        example_input, example_target = np.asarray(example[:, 0]), np.asarray(example[:, 1])

        plan = self._storage_plan(train_cache, val_cache)
        val_dev = (None if plan[1] == "stream"
                   else loop.put_cache(val_cache, self.mesh, storage=plan[1]))
        train_dev, train_res_host = None, None
        if plan[0] != "stream":
            train_dev = loop.put_cache(train_cache, self.mesh, storage=plan[0])
        elif isinstance(train_cache, np.ndarray):
            # hybrid: device-cache the largest batch-multiple prefix that
            # fits the flat budget left over by the val cache; stream the
            # tail (its transfers overlap the prefix scan's compute).
            # FileCache corpora are excluded — decoding a flat-budget-sized
            # prefix into host RAM contradicts why FileCache was chosen
            # (decoded corpus exceeds host RAM) and would pin ~GBs for the
            # whole run; they always stream (loader.FileCache contract).
            reserved = (loop.flat_cache_nbytes(val_cache.shape)
                        if plan[1] == "flat" else 0)
            n_res = self._hybrid_resident_rows(train_cache, reserved)
            if n_res:
                plan[0] = f"hybrid({n_res} rows resident)"
                train_res_host = train_cache[:n_res]
                train_dev = loop.put_cache(train_res_host, self.mesh,
                                           storage="flat")
        if any(p != "tiled" for p in plan):
            print(f"Device cache plan: train={plan[0]}, val={plan[1]} "
                  "(stream = batches fed from host).", flush=True)
        n_train, n_val = train_cache.shape[0], val_cache.shape[0]

        start = time.time()
        base_key = jax.random.PRNGKey(cfg.seed + 1)
        train_cost_functions = empty_losses(PIX2PIX_LOSS_KEYS)
        val_cost_functions = empty_losses(PIX2PIX_LOSS_KEYS)

        from gan_tpu.utils.profiling import Throughput, profile_dir_from_env, trace
        perf = Throughput(self.mesh.size)
        report_perf = os.environ.get("GAN_TPU_PERF") == "1"

        # fault fence (SURVEY §5.3 — recovery.py): anchor a rewind target
        # before the first epoch so a fault before the first periodic save
        # is still recoverable in-process
        from gan_tpu.train.recovery import FaultFence
        fence = FaultFence(self, checkpoint_manager)
        if (checkpoint_manager is not None
                and checkpoint_manager.latest_epoch() is None):
            # anchor=True: deleted once the first real save lands, keeping
            # the reference's training_checkpoints/ layout (5-epoch cadence
            # + final only) in the finished output dir
            checkpoint_manager.save(start_epoch, self.state(), anchor=True)

        epoch = start_epoch
        while epoch < cfg.epochs:
          try:
            ek = jax.random.fold_in(base_key, epoch)
            rng = loop.epoch_rng(cfg.seed, epoch)   # pure in (seed, epoch)
            # pre-start the streamed-val producer BEFORE dispatching the
            # train epoch: its h2d transfers then ride the tunnel while the
            # train scan computes (prefetch threads start at call time),
            # instead of serializing after the epoch. Bit-equal to serial
            # consumption — batches/keys depend only on (cache, step).
            # GAN_TPU_VAL_OVERLAP=0 restores the serial order (A/B baseline).
            val_stream = (self._val_stream(val_cache)
                          if val_dev is None
                          and os.environ.get("GAN_TPU_VAL_OVERLAP", "1") != "0"
                          else None)
            perf.start()
            with trace(profile_dir_from_env() if epoch == start_epoch + 1 else None):
                if train_dev is None:
                    tr = self._run_epoch_streaming(train_cache,
                                                   jax.random.fold_in(ek, 0),
                                                   training=True)
                elif train_res_host is not None:
                    tr = self._run_epoch_hybrid(train_dev, train_res_host,
                                                train_cache,
                                                jax.random.fold_in(ek, 0),
                                                training=True, rng=rng)
                else:
                    tr = self._run_epoch(train_dev, train_cache,
                                         jax.random.fold_in(ek, 0),
                                         training=True, fixed_order=True, rng=rng)
            jax.block_until_ready(self.params)
            ips = perf.stop(n_train)
            if report_perf:
                print(f"[perf] epoch {epoch + 1}: {ips:.1f} images/sec "
                      f"({ips / self.mesh.size:.1f}/chip)", flush=True)
            print("." * (tr.shape[0] // 100), end="", flush=True)
            if val_dev is None:
                va = self._run_epoch_streaming(val_cache,
                                               jax.random.fold_in(ek, 1),
                                               training=False,
                                               batches=val_stream)
            else:
                va = self._run_epoch(val_dev, val_cache, jax.random.fold_in(ek, 1),
                                     training=False, fixed_order=True, rng=rng)
            for i, k in enumerate(PIX2PIX_LOSS_KEYS):
                train_cost_functions[k].append(float(tr[:, i].mean()) if len(tr) else float("nan"))
                val_cost_functions[k].append(float(va[:, i].mean()) if len(va) else float("nan"))

            test_img_path = os.path.join(output_path, "test_images")
            os.makedirs(test_img_path, exist_ok=True)
            if ((epoch + 1) % 5 == 0) and ((epoch + 1) != cfg.epochs):
                if checkpoint_manager is not None:
                    checkpoint_manager.save(epoch + 1, self.state())
                # key_index from the epoch (not a call counter): a FaultFence
                # rewind or --resume regenerates byte-identical sample PNGs
                self.generate_image(example_input, example_target,
                                    os.path.join(test_img_path, f"epoch_{epoch + 1}.png"),
                                    key_index=epoch + 1)
            if (epoch + 1) == cfg.epochs and checkpoint_manager is not None:
                checkpoint_manager.save(epoch + 1, self.state())
            # --checkpoint-every N (recovery extension): extra saves between
            # the reference's 5-epoch cadence bound fault loss to ≤N epochs
            if (cfg.checkpoint_every and checkpoint_manager is not None
                    and (epoch + 1) % cfg.checkpoint_every == 0
                    and checkpoint_manager.latest_epoch() != epoch + 1):
                checkpoint_manager.save(epoch + 1, self.state())

            print(f"\nCumulative training duration at end of epoch {epoch + 1}: "
                  f"{(time.time() - start) / 60:.2f} min")
            print(f"Train generator loss: {round(train_cost_functions['Generator Total Loss'][-1], 2)}, "
                  f"train discriminator loss: {round(train_cost_functions['Discriminator Loss'][-1], 2)}")
            print(f"Val generator loss: {round(val_cost_functions['Generator Total Loss'][-1], 2)}, "
                  f"val discriminator loss: {round(val_cost_functions['Discriminator Loss'][-1], 2)}\n")
          except Exception as e:
            epoch = fence.recover(epoch, e)   # rewound epoch, or raises
            # deterministic re-run reproduces the truncated epochs exactly
            for d in (train_cost_functions, val_cost_functions):
                for k in d:
                    del d[k][max(epoch - start_epoch, 0):]
            continue
          epoch += 1

        return train_cost_functions, val_cost_functions

    def generate_image(self, input_image: np.ndarray, target: np.ndarray,
                       path_filename: str, key_index: Optional[int] = None) -> None:
        """3-panel Input / Ground Truth / Predicted grid (pix2pix.py:220-246).
        Forward runs training-mode (dropout on — the pix2pix paper's test-time
        convention, SURVEY §2.10-Q3)."""
        pred = self.generate(input_image, key_index=key_index)
        save_image_grid([input_image[0], target[0], pred[0]], path_filename,
                        channels=self.config.channels)

    def generate(self, input_batch: np.ndarray,
                 key_index: Optional[int] = None) -> np.ndarray:
        """G(x) with training-mode semantics; returns fp32 in [-1, 1].

        The reference draws fresh (unseeded) dropout randomness per call
        (pix2pix.py:228); the dropout key here folds ``key_index`` into the
        seeded base so samples vary like the reference's while staying
        deterministic from --seed. Internal callers pass an explicit index
        (fit: the epoch number; the CLI's final_test_imgs loop: the image
        index) so a FaultFence rewind or ``--resume`` reproduces exactly the
        sample PNGs of an uninterrupted run; when omitted, a per-call counter
        supplies it (counter starts at 0 → a serial loop of generate() calls
        uses the same index-derived keys as generate_batched)."""
        if self._sample_fn is None:
            self._sample_fn = jax.jit(lambda p, x, k: self.gen.apply(
                p, x, rng=k, compute_dtype=self.config.compute_dtype))
        if key_index is None:
            key_index = self._sample_calls
            self._sample_calls += 1
        key = jax.random.fold_in(jax.random.PRNGKey(self.config.seed + 2),
                                 key_index)
        out = self._sample_fn(self.params["gen"],
                              jnp.asarray(input_batch, self.config.compute_dtype), key)
        return np.asarray(out, np.float32)

    def generate_batched(self, inputs: np.ndarray, chunk: int = 16) -> np.ndarray:
        """Batched inference with per-image batch-norm statistics.

        The reference runs one eager forward per image (pix2pix.py:337); its
        BatchNorm therefore normalizes each image with its OWN stats. A naive
        batched forward would couple samples through BN, so the generator is
        ``vmap``-ed over size-1 sub-batches: identical per-image math, one
        fused device program per chunk (the batch-inference path of
        BASELINE.json config #5). uint8 inputs are normalized to [-1, 1] on
        device per chunk.

        Chunks run through data.loader.pipelined_map, so the h2d upload,
        device forward, and d2h fetch of consecutive chunks overlap on
        parallel tunnel streams (2-4 streams aggregate ~1.9× one stream's
        bandwidth — benchmarks/transfer_bench.py); results return in order,
        and per-image RNG keys are index-derived, so the output is
        bit-identical to the serial loop."""
        from gan_tpu.data.loader import pipelined_map

        if self._batch_fn is None:
            def one(p, x1, k):
                return self.gen.apply(p, x1[None], rng=k,
                                      compute_dtype=self.config.compute_dtype)[0]
            self._batch_fn = jax.jit(jax.vmap(one, in_axes=(None, 0, 0)))
        base = jax.random.PRNGKey(self.config.seed + 2)

        def run(lo):
            xs = jnp.asarray(inputs[lo:lo + chunk])
            if xs.dtype == jnp.uint8:
                xs = normalize_batch(xs, self.config.compute_dtype)
            else:
                xs = xs.astype(self.config.compute_dtype)
            keys = jax.vmap(lambda i: jax.random.fold_in(base, i))(
                jnp.arange(lo, lo + xs.shape[0]))
            return np.asarray(self._batch_fn(self.params["gen"], xs, keys),
                              np.float32)

        outs = list(pipelined_map(range(0, inputs.shape[0], chunk), run))
        return np.concatenate(outs, axis=0)

    def predict(self, predict_cache, output_path: str,
                raw: bool = False, raw_names=None) -> None:
        """prediction_images/img{N}.png per image (pix2pix.py:325-339); with
        ``raw`` also writes the bare generated PNGs (TPU extension for
        downstream pipelines, e.g. the MERGEN YOLOv5 handoff), named after
        their source files when ``raw_names`` is given so downstream pairing
        survives arbitrary listing order.

        ``predict_cache`` is a (N,2,S,S,C) uint8 array or a
        data.loader.FileCache; either way images are decoded, normalized,
        predicted, and written in CHUNKS, so host memory stays bounded at any
        corpus size (the reference holds only one image at a time,
        pix2pix.py:337, but re-decodes per image; we chunk for batched device
        inference). The next chunk's device inference runs on a prefetch
        thread while this one's grids render on the host (matplotlib is the
        e2e bottleneck — benchmarks/infer_bench.py), hiding the device +
        tunnel time entirely."""
        from gan_tpu.data.loader import iter_uint8_batches, prefetch_iter

        plot_path = os.path.join(output_path, "prediction_images")
        os.makedirs(plot_path, exist_ok=True)
        n = predict_cache.shape[0]
        png_names = raw_png_names(raw_names, n) if raw else None
        off = 0
        inferred = ((batch, self.generate_batched(batch[:, 0]))
                    for batch in iter_uint8_batches(predict_cache, 64))
        for batch, preds in prefetch_iter(inferred, depth=1):
            for i in range(batch.shape[0]):
                pair = batch[i].astype(np.float32) / 127.5 - 1.0
                save_image_grid([pair[0], pair[1], preds[i]],
                                os.path.join(plot_path, f"img{off + i}.png"),
                                channels=self.config.channels)
            if raw:
                _write_raw(preds, output_path, png_names[off:off + batch.shape[0]])
            off += batch.shape[0]

    # ------------------------------------------------------------ state mgmt
    def state(self) -> dict:
        return {"params": self.params, "opt_states": self.opt_states}

    def load_state(self, state: dict) -> None:
        rep = replicated_sharding(self.mesh)
        self.params = put_global(state["params"], rep)
        self.opt_states = put_global(state["opt_states"], rep)
