#!/usr/bin/env python3
"""Per-component timing breakdown on the current backend.

Times each piece of the train step (augment, G fwd, D fwd, fused loss fwd,
fwd+bwd, Adam-only, full train step) so kernel work targets the real
bottleneck. Each piece is wrapped in a K-iteration ``lax.scan`` inside one
jit and the result is fetched, so the measurement is true device time —
per-dispatch timing is meaningless over remote-tunnel backends (axon).

Run: `python benchmarks/breakdown.py [batch] [img_size] [K] [model]`
(model: pix2pix | cyclegan; CycleGAN picks its batched/per-application
forward structure from the batch size, as in training).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("GAN_TPU_ALLOW_ANY_SIZE", "1")

import jax
import jax.numpy as jnp
import numpy as np

from gan_tpu.config import Pix2PixConfig
from gan_tpu.data.augment import JITTER_PAD, paired_jitter_batch
from gan_tpu.parallel.mesh import make_mesh
from gan_tpu.train.pix2pix_trainer import Pix2PixTrainer


def scan_time(fn, init_carry, k: int):
    """Device seconds per iteration of carry = fn(carry, i), via one jitted
    k-step scan (compile excluded; result fetched)."""

    @jax.jit
    def run(carry):
        def body(c, i):
            return fn(c, i), ()
        c, _ = jax.lax.scan(body, carry, jnp.arange(k))
        return jax.tree_util.tree_map(
            lambda l: jnp.sum(l.astype(jnp.float32)) if hasattr(l, "astype") else l, c)

    out = run(init_carry)          # compile + warm
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = run(init_carry)
    jax.block_until_ready(jax.device_get(out))
    return (time.perf_counter() - t0) / k


def main_cyclegan(batch: int, img: int, k: int):
    """CycleGAN variant: the 4-network fused step (6 G + 4 primal D
    applications; forward structure dispatched on batch size —
    cyclegan_trainer.BATCHED_PASS_MAX)."""
    from gan_tpu.config import CycleGANConfig
    from gan_tpu.train.cyclegan_trainer import CycleGANTrainer

    cfg = CycleGANConfig(input_images="", target_images="", output="",
                         img_size=img, batch_size=batch, train=True, epochs=1,
                         dtype="bf16", num_devices=1)
    cfg.validate()
    t = CycleGANTrainer(cfg, mesh=make_mesh(1))
    key = jax.random.PRNGKey(0)
    dt = cfg.compute_dtype
    x0 = jax.random.uniform(key, (batch, img, img, 1), dtype=dt, minval=-1, maxval=1)
    y0 = jax.random.uniform(jax.random.fold_in(key, 1), (batch, img, img, 1),
                            dtype=dt, minval=-1, maxval=1)
    structure = ("batched" if batch <= t.BATCHED_PASS_MAX else "per-application")
    results = {}

    # NB 1: every network application must take an iteration-dependent input
    # (x0 + c AND y0 + c, key folded per step) or XLA constant-folds the
    # passes that depend only on closed-over constants — e.g. F(y), G(y),
    # D(y) here — out of the measured scan entirely.
    # NB 2: params ride the scan CARRY, never a closure — closed-over arrays
    # are serialized as constants INTO the compile request, and CycleGAN's
    # four networks (~450 MB fp32) overflow the axon remote-compile body
    # limit (HTTP 413). Carried arguments are device buffers instead.
    def gfwd(carry, i):
        gp, c = carry
        out = t.gen.apply(gp, c, rng=key, compute_dtype=dt)
        return (gp, out.astype(dt))
    results["gen_fwd_x1"] = scan_time(gfwd, (t.params["gen_g"], x0), k)

    def lfwd(carry, i):
        params, c = carry
        combined, _ = t._losses(params, x0 + c, y0 + c,
                                jax.random.fold_in(key, i))
        return (params, c + combined.astype(dt) * 1e-9)
    results["losses_fwd"] = scan_time(lfwd, (t.params, jnp.zeros((), dt)), k)

    def gstep(carry, i):
        params, c = carry
        grads, _ = jax.grad(t._losses, has_aux=True)(
            params, x0 + c, y0 + c, jax.random.fold_in(key, i))
        s = sum(jnp.sum(l.astype(jnp.float32))
                for l in jax.tree_util.tree_leaves(grads))
        return (params, c + (s * 1e-20).astype(dt))
    results["grads_fwdbwd"] = scan_time(gstep, (t.params, jnp.zeros((), dt)), k)

    def aonly(carry, i):
        params, opt = carry
        # unit gradients, built in-program from carried shapes (no constants)
        new_p, new_o = {}, {}
        for name in params:
            gfix = jax.tree_util.tree_map(jnp.ones_like, params[name])
            up, st = t.tx.update(gfix, opt[name], params[name])
            new_p[name] = jax.tree_util.tree_map(lambda p, u: p + u,
                                                 params[name], up)
            new_o[name] = st
        return (new_p, new_o)
    results["adam_only"] = scan_time(aonly, (t.params, t.opt_states), k)

    def step(carry, i):
        params, opt = carry
        params, opt, _ = t._train_step(params, opt, (x0, y0),
                                       jax.random.fold_in(key, i))
        return (params, opt)
    results["train_step"] = scan_time(step, (t.params, t.opt_states), max(4, k // 4))

    print(f"cyclegan batch={batch} img={img} dtype=bf16 "
          f"forward-structure={structure} (per-iteration device time)")
    for name, v in results.items():
        print(f"  {name:12s} {v * 1e3:8.2f} ms   {batch / v:9.1f} pairs/s")


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    img = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    k = int(sys.argv[3]) if len(sys.argv) > 3 else 32
    if len(sys.argv) > 4 and sys.argv[4] == "cyclegan":
        return main_cyclegan(batch, img, k)
    cfg = Pix2PixConfig(data="", output="", img_size=img, batch_size=batch,
                        train=True, epochs=1, dtype="bf16", num_devices=1)
    cfg.validate()
    t = Pix2PixTrainer(cfg, mesh=make_mesh(1))
    key = jax.random.PRNGKey(0)
    dt = cfg.compute_dtype

    src = img + JITTER_PAD
    pair_u8 = jnp.asarray(
        np.random.default_rng(0).integers(0, 255, (batch, 2, src, src, 1), np.uint8))
    x0 = jax.random.uniform(key, (batch, img, img, 1), dtype=dt, minval=-1, maxval=1)
    y0 = jax.random.uniform(jax.random.fold_in(key, 1), (batch, img, img, 1),
                            dtype=dt, minval=-1, maxval=1)

    results = {}

    def aug(c, i):
        x, y = paired_jitter_batch(pair_u8, jax.random.fold_in(key, i),
                                   img_size=img, dtype=dt)
        return (c[0] + x[0, 0, 0, 0], )
    results["augment"] = scan_time(aug, (jnp.zeros((), dt),), k)

    def gfwd(c, i):
        out = t.gen.apply(t.params["gen"], c, rng=key, compute_dtype=dt)
        return out.astype(dt)
    results["gen_fwd"] = scan_time(gfwd, x0, k)

    def dfwd(c, i):
        out = t.disc.apply(t.params["disc"], x0, c, compute_dtype=dt)
        # fold logits back into an image-shaped carry to chain iterations
        return c + jnp.mean(out).astype(dt)
    results["disc_fwd"] = scan_time(dfwd, y0, k)

    def lfwd(c, i):
        combined, _ = t._losses(t.params, x0 + c, y0, key)
        return c + combined.astype(dt) * 1e-9
    results["losses_fwd"] = scan_time(lfwd, jnp.zeros((), dt), k)

    def gstep(c, i):
        grads, _ = jax.grad(t._losses, has_aux=True)(
            t.params, x0 + c, y0, jax.random.fold_in(key, i))
        s = sum(jnp.sum(l.astype(jnp.float32))
                for l in jax.tree_util.tree_leaves(grads))
        return c + (s * 1e-20).astype(dt)
    results["grads_fwdbwd"] = scan_time(gstep, jnp.zeros((), dt), k)

    gfix = jax.tree_util.tree_map(jnp.ones_like, t.params)

    def aonly(carry, i):
        params, opt = carry
        up_g, os_g = t.tx_gen.update(gfix["gen"], opt["gen"], params["gen"])
        up_d, os_d = t.tx_disc.update(gfix["disc"], opt["disc"], params["disc"])
        params = {"gen": jax.tree_util.tree_map(lambda p, u: p + u, params["gen"], up_g),
                  "disc": jax.tree_util.tree_map(lambda p, u: p + u, params["disc"], up_d)}
        return (params, {"gen": os_g, "disc": os_d})
    results["adam_only"] = scan_time(aonly, (t.params, t.opt_states), k)

    def step(carry, i):
        params, opt = carry
        params, opt, _ = t._train_step(params, opt, (x0, y0),
                                       jax.random.fold_in(key, i))
        return (params, opt)
    results["train_step"] = scan_time(step, (t.params, t.opt_states), max(4, k // 4))

    print(f"batch={batch} img={img} dtype=bf16 (per-iteration device time)")
    for name, v in results.items():
        print(f"  {name:12s} {v * 1e3:8.2f} ms   {batch / v:9.1f} img/s")


if __name__ == "__main__":
    main()
