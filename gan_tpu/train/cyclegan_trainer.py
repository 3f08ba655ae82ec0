"""CycleGAN trainer: dual U-Net generators + dual unconditional PatchGANs.

Reference mapping (cycle_gan.py):
  * __init__ (:28-37) — generators g: X→Y and f: Y→X (instance norm),
    discriminators for each domain (target=False), 4 Adam optimizers.
  * train_step (:206-276) — persistent tape over 6 generator + 4
    discriminator forwards; adversarial, cycle (λ·L1, both directions summed
    into both generator totals), and identity (λ/2·L1) losses; disc BCE·0.5;
    4 independent gradient sets. The persistent tape's four backward passes
    become ONE fused backward over a combined scalar: each loss term is
    re-expressed with every *other* network's params stop-gradiented
    (losses.sg_tree) while its own stay live — the primal values are
    identical (XLA CSEs the duplicated forwards, helped by shared dropout
    keys per logical application), and ∂combined/∂θ_net ≡ the reference's
    per-tape gradient for that net. Notably cycle loss feeds BOTH generators
    in the reference (total_gen_g and total_gen_f each contain the full
    total_cycle_loss, cycle_gan.py:244-248); the per-view sg partitioning
    reproduces exactly that double contribution without double-counting
    within a single view.
  * fit (:278-358) — epoch = zip(train_X, train_Y) (length = shorter domain,
    SURVEY §2.10-Q6), independent per-epoch reshuffles, val zip pass with no
    update, 5-epoch checkpoint + sample from generator_g, 4-line epoch print.
  * predict (:360-376) — generator_g over the X domain, 2-panel grids.
"""

from __future__ import annotations

import os
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from gan_tpu.config import CycleGANConfig
from gan_tpu.data.augment import normalize_batch, single_jitter_batch
from gan_tpu.losses import (CYCLEGAN_LOSS_KEYS, cycle_loss, discriminator_loss,
                            empty_losses, generator_adversarial_loss,
                            identity_loss, sg_tree)
from gan_tpu.models import PatchGANDiscriminator, UNetGenerator
from gan_tpu.parallel.mesh import (DATA_AXIS, make_mesh, put_global,
                                   replicated_sharding, shard_batch)
from gan_tpu.train import loop
from gan_tpu.train.checkpoint import CheckpointManager
from gan_tpu.train.optim import adam
from gan_tpu.train.pix2pix_trainer import generator_depth
from gan_tpu.utils.grids import save_image_grid


class CycleGANTrainer:
    def __init__(self, config: CycleGANConfig, *, mesh=None):
        self.config = config
        c = config.n_channels
        self.mesh = mesh if mesh is not None else make_mesh(self._auto_devices(config))
        depth = generator_depth(config.img_size)
        from gan_tpu.train.pix2pix_trainer import use_remat
        self.gen = UNetGenerator(out_channels=c, norm="instance", depth=depth,
                                 remat=use_remat(config, self.mesh.size))
        self.disc = PatchGANDiscriminator(norm="instance", target=False)
        self.tx = adam(config.learning_rate, config.beta_1, config.beta_2)

        key = jax.random.PRNGKey(config.seed)
        kg, kf, kx, ky = jax.random.split(key, 4)
        params = {"gen_g": self.gen.init(kg, c), "gen_f": self.gen.init(kf, c),
                  "disc_x": self.disc.init(kx, c), "disc_y": self.disc.init(ky, c)}
        opt_states = {k: self.tx.init(params[k]) for k in params}
        rep = replicated_sharding(self.mesh)
        self.params = put_global(params, rep)
        self.opt_states = put_global(opt_states, rep)

        self._epoch_fns: dict = {}
        self._stream_fns: dict = {}
        self._sample_fn = None
        self._batch_fn = None
        self._sample_calls = 0   # fresh dropout key per generate() call
        self._rot = None         # hybrid residency-rotation state (fit)
        # remainder step: prep + step in one replicated program (any mesh size)
        self._rem_train = jax.jit(lambda p, o, u8, k: self._rem_step(p, o, u8, k, True))
        self._rem_eval = jax.jit(lambda p, o, u8, k: self._rem_step(p, o, u8, k, False))

    @staticmethod
    def _auto_devices(config: CycleGANConfig) -> int:
        from gan_tpu.parallel.mesh import default_devices
        n = config.num_devices or len(default_devices())
        while config.batch_size % n:
            n -= 1
        return n

    # measured crossover on v5e 256²: batched passes give +47% at batch 4
    # (135 vs 92 pairs/s) but −3% at batch 32 (289 vs 299) — convs saturate
    # and the concat/split bookkeeping stops paying. The same holds for the
    # discriminator's real+fake concat (_disc_pass): 6.49 → 3.50 ms/step at
    # batch 4, but 18.87 vs 19.94 ms at batch 32 where the 4-application
    # form wins ~5% (benchmarks/results/stacked_pass_study.json) — so D
    # batching ships only inside the ≤16 structure too.
    BATCHED_PASS_MAX = 16

    # per-step cost model for epoch segmentation (loop.seg_max_steps):
    # measured v5e 256² — batch-32 steps ~105 ms (305 pairs/s) → ~3.3
    # ms/pair; batch-4 steps ~30 ms (135 pairs/s, the fixed-cost floor).
    # CycleGAN is where the axon long-program fault actually bit (its
    # batch-4 reference config scans 82+ s unsegmented at 12k/domain).
    SEG_T_MIN_MS = 30.0
    SEG_T_IMG_MS = 4.0

    def _losses(self, params, x, y, key):
        """Combined loss with stop-gradient partitioning; picks the batched
        or per-application forward structure by (static) batch size."""
        if max(x.shape[0], y.shape[0]) <= self.BATCHED_PASS_MAX:
            return self._losses_batched(params, x, y, key)
        return self._losses_unbatched(params, x, y, key)

    def _losses_batched(self, params, x, y, key):
        """The reference's six generator forwards per step
        (cycle_gan.py:220-234) run as THREE batched U-Net passes — G([x, y]),
        F([fake_y, y, x]), G([fake_x]) — and its four discriminator
        applications (cycle_gan.py:236-239) as TWO 2B-wide passes
        (``_disc_pass``): same FLOPs, far better MXU utilization at small
        batch (the reference trains at batch 4). Exact because every norm
        here is instance norm (per-sample); dropout masks stay independent
        per sample inside a batched pass. One dropout key per pass, shared
        across the sg views so duplicated forwards CSE to one computation."""
        cfg = self.config
        dt = cfg.compute_dtype
        lam = float(cfg.lam)
        k1, k2, k3 = jax.random.split(key, 3)

        def G(p, imgs, k):
            # batch sizes may differ at the zip tail (bx != by)
            out = self.gen.apply(p, jnp.concatenate(imgs, axis=0), rng=k,
                                 compute_dtype=dt)
            parts, lo = [], 0
            for im in imgs:
                parts.append(out[lo:lo + im.shape[0]])
                lo += im.shape[0]
            return parts

        gp, fp = params["gen_g"], params["gen_f"]
        dxp, dyp = params["disc_x"], params["disc_y"]

        # --- generator-g view (live: gp) --------------------------------
        fake_y_g, same_y_g = G(gp, (x, y), k1)
        cycled_x_g, fake_x_g, _ = G(sg_tree(fp), (fake_y_g, y, x), k2)
        (cycled_y_g,) = G(gp, (fake_x_g,), k3)
        total_cycle_g = cycle_loss(x, cycled_x_g, lam) + cycle_loss(y, cycled_y_g, lam)

        # --- generator-f view (live: fp) --------------------------------
        fake_y_f, _ = G(sg_tree(gp), (x, y), k1)
        cycled_x_f, fake_x_f, same_x_f = G(fp, (fake_y_f, y, x), k2)
        (cycled_y_f,) = G(sg_tree(gp), (fake_x_f,), k3)
        total_cycle_f = cycle_loss(x, cycled_x_f, lam) + cycle_loss(y, cycled_y_f, lam)

        # --- discriminator passes (real+fake batched, both sg views) ----
        dx_real, dx_fake, dx_fake_adv = self._disc_pass(dxp, x, fake_x_f, dt)
        dy_real, dy_fake, dy_fake_adv = self._disc_pass(dyp, y, fake_y_g, dt)

        adv_g = generator_adversarial_loss(dy_fake_adv)
        total_g = adv_g + total_cycle_g + identity_loss(y, same_y_g, lam)
        adv_f = generator_adversarial_loss(dx_fake_adv)
        total_f = adv_f + total_cycle_f + identity_loss(x, same_x_f, lam)
        disc_x = discriminator_loss(dx_real, dx_fake, 0.5)
        disc_y = discriminator_loss(dy_real, dy_fake, 0.5)

        combined = total_g + total_f + disc_x + disc_y
        losses = jnp.stack([adv_g, adv_f, total_cycle_g, total_g, total_f,
                            disc_x, disc_y])
        return combined, losses

    def _disc_pass(self, dp, real, fake, dt):
        """One 2B-wide discriminator pass serving both gradient views.

        The reference applies each discriminator twice per step — to the
        real batch and to the generated batch (cycle_gan.py:236-239).  Both
        applications run here as ONE concatenated pass (exact: the CycleGAN
        discriminator is instance-norm, per-sample — base_gan.py:134 with
        norm_type='instancenorm'); real/fake widths may differ at the zip
        tail.  Two sg views keep the gradient partition of the fused
        backward: the disc-live view stops the fake (the reference tapes
        disc losses with generators outside, cycle_gan.py:256-262), the
        gen-live view stops the discriminator params (adversarial loss
        reaches the generator THROUGH a frozen D).  The two views share an
        identical primal, so XLA CSEs them into a single computation."""
        b = real.shape[0]
        live_d = self.disc.apply(
            dp, jnp.concatenate([real, jax.lax.stop_gradient(fake)], axis=0),
            compute_dtype=dt)
        live_g = self.disc.apply(
            sg_tree(dp),
            jnp.concatenate([jax.lax.stop_gradient(real), fake], axis=0),
            compute_dtype=dt)
        return live_d[:b], live_d[b:], live_g[b:]

    def _losses_unbatched(self, params, x, y, key):
        """Per-application forwards (one dropout key per logical generator
        application, cycle_gan.py:220-234, shared across the sg views so
        duplicated forwards CSE to one computation) — the fast structure at
        large batch where the convs are already saturated."""
        cfg = self.config
        dt = cfg.compute_dtype
        lam = float(cfg.lam)
        k_fy, k_cx, k_fx, k_cy, k_sx, k_sy = jax.random.split(key, 6)

        def G(p, img, k):
            return self.gen.apply(p, img, rng=k, compute_dtype=dt)

        def D(p, img):
            return self.disc.apply(p, img, compute_dtype=dt)

        gp, fp = params["gen_g"], params["gen_f"]
        dxp, dyp = params["disc_x"], params["disc_y"]

        # --- generator-g view (live: gp) --------------------------------
        fake_y_g = G(gp, x, k_fy)
        cycled_x_g = G(sg_tree(fp), fake_y_g, k_cx)
        fake_x_g = G(sg_tree(fp), y, k_fx)
        cycled_y_g = G(gp, fake_x_g, k_cy)
        same_y_g = G(gp, y, k_sy)
        adv_g = generator_adversarial_loss(D(sg_tree(dyp), fake_y_g))
        total_cycle_g = cycle_loss(x, cycled_x_g, lam) + cycle_loss(y, cycled_y_g, lam)
        total_g = adv_g + total_cycle_g + identity_loss(y, same_y_g, lam)

        # --- generator-f view (live: fp) --------------------------------
        fake_y_f = G(sg_tree(gp), x, k_fy)
        cycled_x_f = G(fp, fake_y_f, k_cx)
        fake_x_f = G(fp, y, k_fx)
        cycled_y_f = G(sg_tree(gp), fake_x_f, k_cy)
        same_x_f = G(fp, x, k_sx)
        adv_f = generator_adversarial_loss(D(sg_tree(dxp), fake_x_f))
        total_cycle_f = cycle_loss(x, cycled_x_f, lam) + cycle_loss(y, cycled_y_f, lam)
        total_f = adv_f + total_cycle_f + identity_loss(x, same_x_f, lam)

        # --- discriminator views (live: dxp / dyp; fakes stopped) -------
        disc_x = discriminator_loss(D(dxp, x), D(dxp, jax.lax.stop_gradient(fake_x_f)), 0.5)
        disc_y = discriminator_loss(D(dyp, y), D(dyp, jax.lax.stop_gradient(fake_y_g)), 0.5)

        combined = total_g + total_f + disc_x + disc_y
        losses = jnp.stack([adv_g, adv_f, total_cycle_g, total_g, total_f,
                            disc_x, disc_y])
        return combined, losses

    def _train_step(self, params, opt_states, batch, key, *, axis_name=None):
        x, y = batch
        grads, losses = jax.grad(self._losses, has_aux=True)(params, x, y, key)
        if axis_name is not None:
            grads = jax.lax.pmean(grads, axis_name)
        new_params, new_os = {}, {}
        for name in ("gen_g", "gen_f", "disc_x", "disc_y"):
            up, st = self.tx.update(grads[name], opt_states[name], params[name])
            new_params[name] = jax.tree_util.tree_map(lambda p, u: p + u,
                                                      params[name], up)
            new_os[name] = st
        return new_params, new_os, losses

    def _eval_step(self, params, opt_states, batch, key):
        x, y = batch
        _, losses = self._losses(params, x, y, key)
        return losses

    # --------------------------------------------------------------- extract
    def _prep(self, batch_u8_pair, key, training: bool):
        """(u8_x, u8_y) rows → model batch (independent jitters, kx/ky split
        as in the epoch runner's extract)."""
        cfg = self.config
        u8x, u8y = batch_u8_pair
        if training:
            kx, ky = jax.random.split(key)
            return (single_jitter_batch(u8x, kx, img_size=cfg.img_size,
                                        dtype=cfg.compute_dtype),
                    single_jitter_batch(u8y, ky, img_size=cfg.img_size,
                                        dtype=cfg.compute_dtype))
        return (normalize_batch(u8x, cfg.compute_dtype),
                normalize_batch(u8y, cfg.compute_dtype))

    def _rem_step(self, params, opt_states, batch_u8_pair, key, training: bool):
        k_data, k_step = jax.random.split(key)
        batch = self._prep(batch_u8_pair, k_data, training)
        if training:
            return self._train_step(params, opt_states, batch, k_step)
        return self._eval_step(params, opt_states, batch, k_step)

    def _extract_train(self, caches, idxs, key, mode: str = "take"):
        return self._prep((loop.fetch_rows(caches["x"], idxs["x"], mode),
                           loop.fetch_rows(caches["y"], idxs["y"], mode)),
                          key, True)

    def _extract_eval(self, caches, idxs, key, mode: str = "take"):
        return self._prep((loop.fetch_rows(caches["x"], idxs["x"], mode),
                           loop.fetch_rows(caches["y"], idxs["y"], mode)),
                          key, False)

    def _get_epoch_fn(self, training: bool, mode: str):
        cache_key = (training, mode)
        if cache_key not in self._epoch_fns:
            axis = DATA_AXIS if self.mesh.size > 1 else None
            if training:
                extract = lambda c, i, k: self._extract_train(c, i, k, mode)
                step = lambda p, o, b, k: self._train_step(p, o, b, k, axis_name=axis)
                fn = loop.make_cached_epoch(self.mesh, extract, step,
                                            training=True)
            else:
                extract = lambda c, i, k: self._extract_eval(c, i, k, mode)
                fn = loop.make_cached_epoch(self.mesh, extract,
                                            self._eval_step, training=False)
            self._epoch_fns[cache_key] = fn
        return self._epoch_fns[cache_key]

    # ----------------------------------------------------------------- epoch
    def _run_remainder(self, rows_pair, epoch_key, n_steps: int, training: bool):
        """One replicated step over the zip tail — the shorter domain's
        partial final batch (the reference's ceil-batched Dataset.zip,
        cycle_gan.py:297). Runs at any mesh size; X/Y tail sizes may differ
        (loss reductions are means, as in the reference)."""
        rep = replicated_sharding(self.mesh)
        arr = tuple(put_global(np.ascontiguousarray(r), rep)
                    for r in rows_pair)
        key = jax.random.fold_in(jax.random.fold_in(epoch_key, n_steps), 0)
        if training:
            self.params, self.opt_states, losses = self._rem_train(
                self.params, self.opt_states, arr, key)
        else:
            losses = self._rem_eval(self.params, self.opt_states, arr, key)
        return np.asarray(losses)[None]

    def _run_epoch(self, caches_dev, x_np: np.ndarray, y_np: np.ndarray,
                   epoch_key, *, training: bool, rng: np.random.Generator):
        """One zip(X, Y) pass (cycle_gan.py:297): length = the shorter
        domain's batch count, independent per-epoch shuffles
        (reshuffle_each_iteration=True). Host arrays feed the tail batch."""
        cfg = self.config
        b = cfg.batch_size
        ndev = self.mesh.size
        nx, ny = x_np.shape[0], y_np.shape[0]
        if min(nx, ny) == 0:
            return np.zeros((0, len(CYCLEGAN_LOSS_KEYS)), np.float32)

        n_steps, b_loc, _ = loop.epoch_plan(min(nx, ny), b, ndev)
        total_ref = min(-(-nx // b), -(-ny // b))  # zip of ceil-batched datasets
        mode = loop.gather_mode(max(nx, ny), fixed_order=False, n_devices=ndev)
        # per-epoch reshuffles honoring --buffer-size (tf.data windowed
        # shuffle, cycle_gan.py:140-150): ndev == 1 draws the exact reference
        # global order; ndev > 1 draws per-device stripe permutations (windowed
        # per stripe) with the zip tail fed from the rows the full steps did
        # not draw — each epoch visits each row at most once (exactly once for
        # the shorter domain), matching the reference's exactly-once pass
        if ndev == 1:
            perm_x = loop.epoch_perm(nx, cfg.buffer_size, rng)
            perm_y = loop.epoch_perm(ny, cfg.buffer_size, rng)
            perms = {"x": perm_x[: n_steps * b].reshape(n_steps, b).astype(np.int32),
                     "y": perm_y[: n_steps * b].reshape(n_steps, b).astype(np.int32)}
            left_x, left_y = perm_x[n_steps * b:], perm_y[n_steps * b:]
        else:
            perms_x, left_x = loop.shuffled_stripe_perm(
                nx, ndev=ndev, n_steps=n_steps, per_dev_batch=b_loc,
                buffer_size=cfg.buffer_size, rng=rng)
            perms_y, left_y = loop.shuffled_stripe_perm(
                ny, ndev=ndev, n_steps=n_steps, per_dev_batch=b_loc,
                buffer_size=cfg.buffer_size, rng=rng)
            perms = {"x": perms_x, "y": perms_y}
        all_losses = []
        if n_steps:
            fn = self._get_epoch_fn(training, mode)
            seg = loop.seg_max_steps(b_loc, cfg.img_size, self.mesh,
                                     t_min_ms=self.SEG_T_MIN_MS,
                                     t_img_ms=self.SEG_T_IMG_MS)
            if training:
                self.params, self.opt_states, losses = loop.run_epoch_segments(
                    fn, self.params, self.opt_states, caches_dev, perms,
                    epoch_key, max_steps=seg)
            else:
                _, _, losses = loop.run_epoch_segments(
                    fn, self.params, self.opt_states, caches_dev, perms,
                    epoch_key, max_steps=seg)
            all_losses.append(np.asarray(losses))
        if total_ref > n_steps:  # the shorter domain's partial final batch
            bx = min(b, nx - n_steps * b)
            by = min(b, ny - n_steps * b)
            rows = (x_np[left_x[:bx]], y_np[left_y[:by]])
            all_losses.append(self._run_remainder(rows, epoch_key, n_steps,
                                                  training))
        if not all_losses:
            return np.zeros((0, len(CYCLEGAN_LOSS_KEYS)), np.float32)
        return np.concatenate(all_losses, axis=0)

    def _get_stream_fn(self, training: bool):
        if training not in self._stream_fns:
            prep = lambda u8, k: self._prep(u8, k, training)
            if training:
                axis = DATA_AXIS if self.mesh.size > 1 else None
                step = lambda p, o, b, k: self._train_step(p, o, b, k, axis_name=axis)
            else:
                step = self._eval_step
            self._stream_fns[training] = loop.make_sharded_step(
                self.mesh, prep, step, training=training)
        return self._stream_fns[training]

    def _stream_batches(self, x, y, perm_x, perm_y, *, start_step: int,
                        n_total: int, depth: int = 2):
        """Prefetched (step, pair, is_full) zip stream over the given domain
        orders, enumerated from ``start_step`` and stopping at ``n_total``
        global steps — the host half of streamed/hybrid epochs. Batch pairs
        are assembled in a prefetch thread (starts at CALL time, so hybrid
        tail transfers overlap the resident scan) and ``device_put`` on
        several parallel tunnel streams (loader.pipelined_map — single-stream
        h2d is the streamed path's bottleneck and 2-4 streams aggregate
        ~1.9×); full batches stripe-reorder so per-sample RNG pairing matches
        the cached striped layout (see make_sharded_step)."""
        from gan_tpu.data.loader import (iter_uint8_batches,
                                         prefetched_put_stream)

        b = self.config.batch_size
        ndev = self.mesh.size
        stripe = loop.stripe_order(b, ndev) if ndev > 1 else None

        def assemble():
            pairs = zip(iter_uint8_batches(x, b, perm_x),
                        iter_uint8_batches(y, b, perm_y))
            for step, (u8x, u8y) in enumerate(pairs, start=start_step):
                if step >= n_total:
                    break
                if u8x.shape[0] == b and u8y.shape[0] == b and b % ndev == 0:
                    if stripe is not None:
                        u8x, u8y = u8x[stripe], u8y[stripe]
                    yield step, (np.ascontiguousarray(u8x),
                                 np.ascontiguousarray(u8y)), True
                else:
                    yield step, (u8x, u8y), False

        def put(item):
            step, (u8x, u8y), full = item
            if full:
                return (step, (shard_batch(u8x, self.mesh),
                               shard_batch(u8y, self.mesh)), True)
            return item

        return prefetched_put_stream(assemble(), put, depth=depth)

    def _consume_stream(self, batches, epoch_key, training: bool) -> list:
        """Run the sharded DP step over prefetched (step, pair, full) items;
        the zip tail runs replicated. Returns per-step losses."""
        fn = self._get_stream_fn(training)
        losses = []
        for step, pair, full in batches:
            if full:
                key = jax.random.fold_in(epoch_key, step)
                if training:
                    self.params, self.opt_states, l = fn(
                        self.params, self.opt_states, pair, key)
                else:
                    l = fn(self.params, self.opt_states, pair, key)
                losses.append(l)  # device array — don't sync mid-epoch
            else:
                losses.append(self._run_remainder(pair, epoch_key, step,
                                                  training))
        return losses

    def _run_epoch_streaming(self, x, y, epoch_key, *, training: bool,
                             rng: np.random.Generator, batches=None):
        """Host-streamed zip(X, Y) pass: sources are host uint8 arrays
        (``--device-cache off``) or data.loader.FileCache objects (corpora
        bigger than host RAM — batches decode from files in background
        threads). Full batches shard over the mesh through the same psum'd
        step as the cached path; the zip tail runs replicated.

        ``batches``: a pre-started stream from :meth:`_val_stream` (fit
        starts the VAL producer before the train epoch so its transfers
        overlap train compute; the epoch's perms were then already drawn
        from the caller's rng — this method must not draw again)."""
        cfg = self.config
        b = cfg.batch_size
        nx, ny = x.shape[0], y.shape[0]
        if min(nx, ny) == 0:
            return np.zeros((0, len(CYCLEGAN_LOSS_KEYS)), np.float32)
        if batches is None:
            perm_x = loop.epoch_perm(nx, cfg.buffer_size, rng)
            perm_y = loop.epoch_perm(ny, cfg.buffer_size, rng)
            n_total = min(-(-nx // b), -(-ny // b))
            batches = self._stream_batches(x, y, perm_x, perm_y,
                                           start_step=0, n_total=n_total)
        losses = self._consume_stream(batches, epoch_key, training)
        if not losses:
            return np.zeros((0, len(CYCLEGAN_LOSS_KEYS)), np.float32)
        return np.concatenate([np.asarray(l).reshape(1, -1) for l in losses])

    def _val_stream(self, val_x, val_y, rng: np.random.Generator):
        """Pre-started streamed-val producer (draws this epoch's val perms
        NOW — rng is the epoch's dedicated val stream, loop.epoch_rng(seed,
        epoch, 1), so drawing before the train epoch perturbs nothing) with
        a depth that lets the whole val set transfer during train
        (loader.val_stream_depth)."""
        from gan_tpu.data.loader import val_stream_depth
        cfg = self.config
        b = cfg.batch_size
        nx, ny = val_x.shape[0], val_y.shape[0]
        if min(nx, ny) == 0:
            return None
        perm_x = loop.epoch_perm(nx, cfg.buffer_size, rng)
        perm_y = loop.epoch_perm(ny, cfg.buffer_size, rng)
        n_total = min(-(-nx // b), -(-ny // b))
        row = (int(np.prod(val_x.shape[1:])) + int(np.prod(val_y.shape[1:])))
        return self._stream_batches(
            val_x, val_y, perm_x, perm_y, start_step=0, n_total=n_total,
            depth=val_stream_depth(min(nx, ny), b, row))

    # Hybrid epochs keep LESS resident than the pure-flat ceiling: a 25.4k/
    # domain hybrid run at 100.6% of the then-3.27 GB flat bracket crashed
    # the worker mid-epoch (r3). That crash predated epoch segmentation and
    # was likely the same long-program fault segmentation since fixed, but
    # the streamed tail's parallel puts + the streamed-step executable DO
    # share the argument-bytes budget with the resident cache, so 0.8 stays
    # as measured-safe headroom (hybrid is now only reached beyond the full
    # 4.2 GB flat ceiling, where re-bracketing has no production config).
    HYBRID_RESIDENT_MARGIN = 0.8

    def _hybrid_resident_rows(self, x, y, reserved_bytes: int = 0) -> int:
        """Largest batch-multiple row count (per domain) whose dual flat
        caches fit CycleGAN's flat budget minus ``reserved_bytes``; 0
        disables the hybrid path."""
        from gan_tpu.data.loader import (CYCLEGAN_FLAT_SAFE_BYTES,
                                         flat_cache_budget)
        budget = flat_cache_budget(
            self.mesh, safe_bytes=CYCLEGAN_FLAT_SAFE_BYTES) * self.mesh.size
        budget = int((budget - reserved_bytes) * self.HYBRID_RESIDENT_MARGIN) // 2  # per domain
        # per-row flat bytes from the single source of truth (128-lane
        # rounding lives in loop.flat_cache_nbytes)
        row = loop.flat_cache_nbytes((32,) + x.shape[1:]) // 32
        b = self.config.batch_size
        if budget <= 0 or row <= 0:
            return 0
        return max(0, min(int(budget // row), x.shape[0], y.shape[0])
                   // b * b)

    # --------------------------------------------------- hybrid residency rotation
    def _hybrid_rotation_init(self, nx: int, ny: int, n_res: int,
                              start_epoch: int):
        """Rotation state for hybrid epochs: blocks of one global batch;
        per-domain stride sized so the residency window wraps the whole
        corpus about once over the configured run (ceil(M / epochs) blocks
        per epoch — the reference 25.4k/200-epoch config refreshes ~2.5% of
        the tail's transfer volume per epoch). GAN_TPU_HYBRID_ROTATE=0
        disables (frozen partition, the pre-round-5 behavior);
        GAN_TPU_HYBRID_ROTATE_STRIDE overrides the stride in blocks."""
        if os.environ.get("GAN_TPU_HYBRID_ROTATE", "1") == "0":
            return None
        cfg = self.config
        k = cfg.batch_size
        m_res = n_res // k
        env_stride = os.environ.get("GAN_TPU_HYBRID_ROTATE_STRIDE")
        rot = {"k": k, "m_res": m_res, "M": {}, "stride": {},
               "synced": start_epoch}
        for dom, n in (("x", nx), ("y", ny)):
            M = n // k
            stride = (int(env_stride) if env_stride is not None
                      else -(-M // max(1, cfg.epochs)))
            rot["M"][dom] = M
            rot["stride"][dom] = max(0, min(stride, M - m_res))
        if all(s == 0 for s in rot["stride"].values()):
            return None  # nothing ever streams in block units — no rotation
        return rot

    def _hybrid_resident_rows_for(self, dom: str, epoch: int) -> np.ndarray:
        """Global row indices resident at ``epoch`` (slot order)."""
        rot = self._rot
        k = rot["k"]
        plan = loop.rotation_plan(rot["M"][dom], rot["m_res"],
                                  rot["stride"][dom], epoch)
        return (plan[:, None] * k + np.arange(k)).reshape(-1)

    def _hybrid_streamed_rows_for(self, dom: str, n: int,
                                  epoch: int) -> np.ndarray:
        """Global row indices streamed at ``epoch`` (ascending): the blocks
        not resident plus the permanent sub-block residue [M·k, n)."""
        rot = self._rot
        k = rot["k"]
        M = rot["M"][dom]
        plan = loop.rotation_plan(M, rot["m_res"], rot["stride"][dom], epoch)
        mask = np.ones(M, bool)
        mask[plan] = False
        blocks = np.nonzero(mask)[0]
        rows = (blocks[:, None] * k + np.arange(k)).reshape(-1)
        return np.concatenate([rows, np.arange(M * k, n)])

    def _sync_hybrid_rotation(self, caches, x, y, epoch):
        """Bring the resident FlatCaches from the partition of the last
        synced epoch to ``epoch``'s (uploading only the differing slots —
        normally ``stride`` blocks; more only right after a FaultFence
        rewind), and return (caches, (streamed_rows_x, streamed_rows_y)).
        Pure replay (loop.rotation_plan) keeps this deterministic under
        rewind/resume."""
        rot = self._rot
        k = rot["k"]
        for dom, arr in (("x", x), ("y", y)):
            cur = loop.rotation_plan(rot["M"][dom], rot["m_res"],
                                     rot["stride"][dom], rot["synced"])
            tgt = loop.rotation_plan(rot["M"][dom], rot["m_res"],
                                     rot["stride"][dom], epoch)
            for j in np.nonzero(cur != tgt)[0]:
                blk = int(tgt[j])
                caches[dom] = loop.update_cache_rows(
                    caches[dom], np.ascontiguousarray(arr[blk * k:(blk + 1) * k]),
                    int(j) * k, self.mesh)
        rot["synced"] = epoch
        return caches, (self._hybrid_streamed_rows_for("x", x.shape[0], epoch),
                        self._hybrid_streamed_rows_for("y", y.shape[0], epoch))

    def _run_epoch_hybrid(self, caches_dev, res_x, res_y, x, y, epoch_key, *,
                          training: bool, rng: np.random.Generator,
                          tail_rows=None):
        """Resident + streamed-tail zip epoch for corpora beyond CycleGAN's
        flat budget (loader.CYCLEGAN_FLAT_SAFE_BYTES, 4.2 GB — the
        25.4k/domain reference corpus fits flat since epoch segmentation;
        hybrid serves corpora beyond that).

        ``n_res`` rows of EACH domain live device-resident (FlatCache) and
        run as the scanned epoch; the rest stream, their transfers
        overlapped against the scan. Per-epoch reshuffles draw within the
        resident and streamed partitions independently (``--buffer-size``
        windowed semantics apply within each); WHICH rows are resident
        rotates across epochs (fit's _sync_hybrid_rotation passes this
        epoch's streamed rows as ``tail_rows``), so over a run any two rows
        can share a partition — the frozen-partition deviation the
        non-rotating form had (tf.data's windowed shuffle slides over the
        WHOLE dataset, cycle_gan.py:140-150) is gone, at a per-epoch refresh
        cost of ``stride`` blocks (loop.rotation_plan). ``tail_rows=None``
        keeps the fixed partition (rows [0, n_res) resident — direct callers
        and GAN_TPU_HYBRID_ROTATE=0). Each row is still visited at most once
        per epoch, exactly once for the shorter domain. RNG streams stay
        step-indexed exactly like a fully cached epoch (scan steps
        0..S_res-1, streamed steps S_res.., zip tail last)."""
        cfg = self.config
        b = cfg.batch_size
        ndev = self.mesh.size
        nx, ny = x.shape[0], y.shape[0]
        n_res = res_x.shape[0]
        assert n_res % b == 0 and res_y.shape[0] == n_res
        if min(nx, ny) == 0:
            return np.zeros((0, len(CYCLEGAN_LOSS_KEYS)), np.float32)
        _, b_loc, _ = loop.epoch_plan(min(nx, ny), b, ndev)
        total_ref = min(-(-nx // b), -(-ny // b))
        s_res = n_res // b

        # streamed partitions in windowed-shuffled order, producer started
        # BEFORE the scan so transfers overlap compute. Draw sizes equal the
        # fixed-partition form's (resident count is constant), so the rng
        # stream stays aligned whichever partition this epoch rotated to.
        if tail_rows is None:
            tail_x = n_res + loop.epoch_perm(nx - n_res, cfg.buffer_size, rng)
            tail_y = n_res + loop.epoch_perm(ny - n_res, cfg.buffer_size, rng)
        else:
            rows_x, rows_y = tail_rows
            assert len(rows_x) == nx - n_res and len(rows_y) == ny - n_res
            tail_x = rows_x[loop.epoch_perm(len(rows_x), cfg.buffer_size, rng)]
            tail_y = rows_y[loop.epoch_perm(len(rows_y), cfg.buffer_size, rng)]
        tail = self._stream_batches(
            x, y, tail_x, tail_y, start_step=s_res, n_total=total_ref,
            depth=int(os.environ.get("GAN_TPU_HYBRID_DEPTH", "16")))

        # resident partition: scanned epoch over the dual flat caches with
        # per-epoch in-partition reshuffles (drawn exactly once: s_res * b
        # == n_res rows per domain)
        all_losses = []
        if s_res:
            if ndev == 1:
                perms = {
                    "x": loop.epoch_perm(n_res, cfg.buffer_size, rng)
                    .reshape(s_res, b).astype(np.int32),
                    "y": loop.epoch_perm(n_res, cfg.buffer_size, rng)
                    .reshape(s_res, b).astype(np.int32)}
            else:
                px, _ = loop.shuffled_stripe_perm(
                    n_res, ndev=ndev, n_steps=s_res, per_dev_batch=b_loc,
                    buffer_size=cfg.buffer_size, rng=rng)
                py, _ = loop.shuffled_stripe_perm(
                    n_res, ndev=ndev, n_steps=s_res, per_dev_batch=b_loc,
                    buffer_size=cfg.buffer_size, rng=rng)
                perms = {"x": px, "y": py}
            fn = self._get_epoch_fn(training, "take")
            seg = loop.seg_max_steps(b_loc, cfg.img_size, self.mesh,
                                     t_min_ms=self.SEG_T_MIN_MS,
                                     t_img_ms=self.SEG_T_IMG_MS)
            if training:
                self.params, self.opt_states, losses = loop.run_epoch_segments(
                    fn, self.params, self.opt_states, caches_dev, perms,
                    epoch_key, max_steps=seg)
            else:
                _, _, losses = loop.run_epoch_segments(
                    fn, self.params, self.opt_states, caches_dev, perms,
                    epoch_key, max_steps=seg)
            all_losses.append(np.asarray(losses))

        stream_losses = self._consume_stream(tail, epoch_key, training)
        all_losses += [np.asarray(l).reshape(1, -1) for l in stream_losses]
        if not all_losses:
            return np.zeros((0, len(CYCLEGAN_LOSS_KEYS)), np.float32)
        return np.concatenate(all_losses, axis=0)

    def _storage_plan(self, train_pair, val_pair) -> list[str]:
        """Storage plan for the (train_x, train_y) and (val_x, val_y) groups
        — each zipped pair caches or streams TOGETHER (the epoch runner zips
        the domains); FileCache corpora always stream. Returns two of
        'tiled'|'flat'|'stream' (data.loader.plan_cache_storage)."""
        from gan_tpu.data.loader import (CYCLEGAN_FLAT_SAFE_BYTES, FileCache,
                                         plan_cache_storage)
        groups = [None if any(isinstance(c, FileCache) for c in g)
                  else [c.shape for c in g] for g in (train_pair, val_pair)]
        return plan_cache_storage(groups, self.mesh, self.config.device_cache,
                                  flat_safe_bytes=CYCLEGAN_FLAT_SAFE_BYTES)

    # ---------------------------------------------------------------- public
    def fit(self, train_x: np.ndarray, train_y: np.ndarray, val_x: np.ndarray,
            val_y: np.ndarray, test_cache: np.ndarray, output_path: str,
            checkpoint_manager: Optional[CheckpointManager] = None,
            start_epoch: int = 0):
        """Epoch loop — ref cycle_gan.py:278-358. Caches from
        gan_tpu.data.pipeline.build_cyclegan_cache (train: (N,S+30,S+30,C),
        val/test: (N,S,S,C))."""
        cfg = self.config
        print("\nTraining...\n", flush=True)

        example = np.asarray(normalize_batch(test_cache[:1].astype(np.float32)))

        plan = self._storage_plan((train_x, train_y), (val_x, val_y))
        caches_train = caches_val = None
        res_x = res_y = None
        if plan[1] != "stream":
            caches_val = {"x": loop.put_cache(val_x, self.mesh, storage=plan[1]),
                          "y": loop.put_cache(val_y, self.mesh, storage=plan[1])}
        if plan[0] != "stream":
            caches_train = {"x": loop.put_cache(train_x, self.mesh, storage=plan[0]),
                            "y": loop.put_cache(train_y, self.mesh, storage=plan[0])}
        else:
            from gan_tpu.data.loader import FileCache
            reserved = (sum(loop.flat_cache_nbytes(c.shape)
                            for c in (val_x, val_y))
                        if plan[1] == "flat" else 0)
            if not any(isinstance(c, FileCache) for c in (train_x, train_y)):
                n_res = self._hybrid_resident_rows(train_x, train_y, reserved)
                if n_res:
                    plan[0] = f"hybrid({n_res} rows/domain resident)"
                    # rotating residency: the initial resident rows are the
                    # start_epoch partition (resume-correct), refreshed per
                    # epoch by _sync_hybrid_rotation
                    self._rot = self._hybrid_rotation_init(
                        len(train_x), len(train_y), n_res, start_epoch)
                    if self._rot is not None:
                        res_x = train_x[self._hybrid_resident_rows_for(
                            "x", start_epoch)]
                        res_y = train_y[self._hybrid_resident_rows_for(
                            "y", start_epoch)]
                    else:
                        res_x, res_y = train_x[:n_res], train_y[:n_res]
                    caches_train = {
                        "x": loop.put_cache(res_x, self.mesh, storage="flat"),
                        "y": loop.put_cache(res_y, self.mesh, storage="flat")}
        if any(p != "tiled" for p in plan):
            print(f"Device cache plan: train={plan[0]}, val={plan[1]} "
                  "(stream = batches fed from host).", flush=True)

        start = time.time()
        base_key = jax.random.PRNGKey(cfg.seed + 1)
        train_cost = empty_losses(CYCLEGAN_LOSS_KEYS)
        val_cost = empty_losses(CYCLEGAN_LOSS_KEYS)

        from gan_tpu.utils.profiling import Throughput, profile_dir_from_env, trace
        perf = Throughput(self.mesh.size)
        report_perf = os.environ.get("GAN_TPU_PERF") == "1"

        # fault fence (SURVEY §5.3 — recovery.py): anchor a rewind target
        from gan_tpu.train.recovery import FaultFence
        fence = FaultFence(self, checkpoint_manager)
        if (checkpoint_manager is not None
                and checkpoint_manager.latest_epoch() is None):
            # anchor=True: deleted once the first real save lands (reference
            # training_checkpoints/ holds the 5-epoch cadence + final only)
            checkpoint_manager.save(start_epoch, self.state(), anchor=True)

        epoch = start_epoch
        while epoch < cfg.epochs:
          try:
            ek = jax.random.fold_in(base_key, epoch)
            # per-epoch host RNG, pure in (seed, epoch): CycleGAN's shuffle
            # orders are re-drawn identically when a FaultFence rewind
            # re-runs an epoch or --resume restarts mid-run (loop.epoch_rng)
            rng = loop.epoch_rng(cfg.seed, epoch, 0)
            rng_val = loop.epoch_rng(cfg.seed, epoch, 1)
            # pre-start the streamed-val producer BEFORE the train epoch so
            # val transfers overlap train compute (see Pix2PixTrainer.fit);
            # GAN_TPU_VAL_OVERLAP=0 restores the serial order (A/B baseline)
            val_stream = (self._val_stream(val_x, val_y, rng_val)
                          if caches_val is None
                          and os.environ.get("GAN_TPU_VAL_OVERLAP", "1") != "0"
                          else None)
            perf.start()
            with trace(profile_dir_from_env() if epoch == start_epoch + 1 else None):
                if caches_train is None:
                    tr = self._run_epoch_streaming(train_x, train_y,
                                                   jax.random.fold_in(ek, 0),
                                                   training=True, rng=rng)
                elif res_x is not None:
                    tail_rows = None
                    if self._rot is not None:
                        caches_train, tail_rows = self._sync_hybrid_rotation(
                            caches_train, train_x, train_y, epoch)
                    tr = self._run_epoch_hybrid(caches_train, res_x, res_y,
                                                train_x, train_y,
                                                jax.random.fold_in(ek, 0),
                                                training=True, rng=rng,
                                                tail_rows=tail_rows)
                else:
                    tr = self._run_epoch(caches_train, train_x, train_y,
                                         jax.random.fold_in(ek, 0), training=True,
                                         rng=rng)
            jax.block_until_ready(self.params)
            b = cfg.batch_size
            # actual pairs consumed: the zip tail is partial, don't count it full
            pairs = min(tr.shape[0] * b, len(train_x), len(train_y))
            ips = perf.stop(pairs)
            if report_perf:
                print(f"[perf] epoch {epoch + 1}: {ips:.1f} image-pairs/sec "
                      f"({ips / self.mesh.size:.1f}/chip)", flush=True)
            print("." * (tr.shape[0] // 100), end="", flush=True)
            if caches_val is None:
                va = self._run_epoch_streaming(val_x, val_y,
                                               jax.random.fold_in(ek, 1),
                                               training=False, rng=rng_val,
                                               batches=val_stream)
            else:
                va = self._run_epoch(caches_val, val_x, val_y,
                                     jax.random.fold_in(ek, 1), training=False,
                                     rng=rng_val)
            for i, k in enumerate(CYCLEGAN_LOSS_KEYS):
                train_cost[k].append(float(tr[:, i].mean()) if len(tr) else float("nan"))
                val_cost[k].append(float(va[:, i].mean()) if len(va) else float("nan"))

            test_img_path = os.path.join(output_path, "test_images")
            os.makedirs(test_img_path, exist_ok=True)
            if ((epoch + 1) % 5 == 0) and ((epoch + 1) != cfg.epochs):
                if checkpoint_manager is not None:
                    checkpoint_manager.save(epoch + 1, self.state())
                # key_index from the epoch: rewind/--resume re-generate
                # byte-identical sample PNGs (see generate)
                self.generate_image(example,
                                    os.path.join(test_img_path, f"epoch_{epoch + 1}.png"),
                                    key_index=epoch + 1)
            if (epoch + 1) == cfg.epochs and checkpoint_manager is not None:
                checkpoint_manager.save(epoch + 1, self.state())
            # --checkpoint-every N (recovery extension) — see pix2pix twin
            if (cfg.checkpoint_every and checkpoint_manager is not None
                    and (epoch + 1) % cfg.checkpoint_every == 0
                    and checkpoint_manager.latest_epoch() != epoch + 1):
                checkpoint_manager.save(epoch + 1, self.state())

            print(f"\nCumulative training duration at end of epoch {epoch + 1}: "
                  f"{(time.time() - start) / 60:.2f} min")
            print(f"Train X->Y generator loss: {round(train_cost['Total X->Y Generator Loss'][-1], 2)}, "
                  f"train discriminator X loss: {round(train_cost['Discriminator X Loss'][-1], 2)}")
            print(f"Train Y->X generator loss: {round(train_cost['Total Y->X Generator Loss'][-1], 2)}, "
                  f"train discriminator Y loss: {round(train_cost['Discriminator Y Loss'][-1], 2)}")
            print(f"Val X->Y generator loss: {round(val_cost['Total X->Y Generator Loss'][-1], 2)}, "
                  f"val discriminator X loss: {round(val_cost['Discriminator X Loss'][-1], 2)}")
            print(f"Val Y->X generator loss: {round(val_cost['Total Y->X Generator Loss'][-1], 2)}, "
                  f"val discriminator Y loss: {round(val_cost['Discriminator Y Loss'][-1], 2)}\n")
          except Exception as e:
            epoch = fence.recover(epoch, e)   # rewound epoch, or raises
            for d in (train_cost, val_cost):
                for k in d:
                    del d[k][max(epoch - start_epoch, 0):]
            continue
          epoch += 1

        return train_cost, val_cost

    def generate(self, input_batch: np.ndarray,
                 key_index: Optional[int] = None) -> np.ndarray:
        """generator_g(x) with training-mode semantics (cycle_gan.py:186).

        ``key_index`` is folded into the seeded key so successive samples
        vary as the reference's unseeded dropout does while staying
        deterministic from --seed. Internal callers pass an explicit index
        (fit: the epoch number; the CLI final loop: the image index) so a
        FaultFence rewind or ``--resume`` reproduces the exact sample PNGs
        of an uninterrupted run; when omitted a per-call counter supplies it
        (starts at 0 → serial generate() keys match generate_batched's)."""
        if self._sample_fn is None:
            self._sample_fn = jax.jit(lambda p, x, k: self.gen.apply(
                p, x, rng=k, compute_dtype=self.config.compute_dtype))
        if key_index is None:
            key_index = self._sample_calls
            self._sample_calls += 1
        key = jax.random.fold_in(jax.random.PRNGKey(self.config.seed + 2),
                                 key_index)
        out = self._sample_fn(self.params["gen_g"],
                              jnp.asarray(input_batch, self.config.compute_dtype), key)
        return np.asarray(out, np.float32)

    def generate_image(self, input_image: np.ndarray, path_filename: str,
                       key_index: Optional[int] = None) -> None:
        """2-panel Input / Predicted grid (cycle_gan.py:179-204)."""
        pred = self.generate(input_image, key_index=key_index)
        save_image_grid([input_image[0], pred[0]], path_filename,
                        channels=self.config.channels)

    def generate_batched(self, inputs: np.ndarray, chunk: int = 16) -> np.ndarray:
        """Chunked batched inference. CycleGAN's instance norm is per-sample,
        so direct batching is exactly equivalent to the reference's per-image
        forwards (unlike Pix2Pix's batch norm — see Pix2PixTrainer). uint8
        inputs are normalized to [-1, 1] on device per chunk.

        Chunks run through data.loader.pipelined_map so consecutive chunks'
        h2d/compute/d2h overlap on parallel tunnel streams (see
        Pix2PixTrainer.generate_batched); chunk RNG keys are offset-derived,
        so the output is bit-identical to the serial loop."""
        from gan_tpu.data.loader import pipelined_map

        if self._batch_fn is None:
            self._batch_fn = jax.jit(lambda p, x, k: self.gen.apply(
                p, x, rng=k, compute_dtype=self.config.compute_dtype))
        base = jax.random.PRNGKey(self.config.seed + 2)

        def run(lo):
            xs = jnp.asarray(inputs[lo:lo + chunk])
            if xs.dtype == jnp.uint8:
                xs = normalize_batch(xs, self.config.compute_dtype)
            else:
                xs = xs.astype(self.config.compute_dtype)
            return np.asarray(
                self._batch_fn(self.params["gen_g"], xs,
                               jax.random.fold_in(base, lo)), np.float32)

        outs = list(pipelined_map(range(0, inputs.shape[0], chunk), run))
        return np.concatenate(outs, axis=0)

    def predict(self, predict_cache, output_path: str,
                raw: bool = False, raw_names=None) -> None:
        """prediction_images/img{N}.png via generator_g (cycle_gan.py:360-376).
        ``predict_cache`` is a (N,S,S,C) uint8 array or a data.loader
        FileCache; images are decoded/predicted/written in chunks so host
        memory stays bounded at any corpus size. The next chunk's device
        inference runs on a prefetch thread while this one's grids render on
        the host (see Pix2PixTrainer.predict)."""
        from gan_tpu.data.loader import iter_uint8_batches, prefetch_iter
        from gan_tpu.train.pix2pix_trainer import _write_raw, raw_png_names

        plot_path = os.path.join(output_path, "prediction_images")
        os.makedirs(plot_path, exist_ok=True)
        n = predict_cache.shape[0]
        png_names = raw_png_names(raw_names, n) if raw else None
        off = 0
        inferred = ((batch, self.generate_batched(batch))
                    for batch in iter_uint8_batches(predict_cache, 64))
        for batch, preds in prefetch_iter(inferred, depth=1):
            for i in range(batch.shape[0]):
                x = batch[i].astype(np.float32) / 127.5 - 1.0
                save_image_grid([x, preds[i]],
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
