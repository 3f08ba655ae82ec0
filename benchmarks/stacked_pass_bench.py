#!/usr/bin/env python3
"""Stacked (vmapped-params) generator passes vs sequential passes.

CycleGAN's batched small-batch structure runs the six generator forwards as
three passes — G([x,y]) 2B, F([fake_y,y,x]) 3B, G([fake_x]) B — because G/F
are different networks and concat-batching only merges applications of the
SAME net (cyclegan_trainer._losses_batched).  The dependency depth is only
two, though: level 1 needs raw inputs only (G on [x,y], F on [y,x]), level 2
the fakes (G on [fake_x], F on [fake_y]).  Stacking the two nets' params on
a leading axis and ``jax.vmap``-ing the apply collapses the structure to TWO
passes of width 2×2B and 2×B.  The open question is how XLA:TPU lowers the
vmapped convs: batched-rhs convs become feature-grouped convs, which may (or
may not) use the MXU as well as two separate convs.

This microbenchmark answers it empirically: forward and forward+backward
device time of the generator work per train step under both structures, and
the discriminator work (2 sequential 2B passes vs one 2-lane stacked pass).
Measured inside a K-iteration lax.scan with params in the carry (axon's
remote-compile body rejects large closed-over constants — HTTP 413).

Usage: python benchmarks/stacked_pass_bench.py [batch] [img_size] [K]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("GAN_TPU_ALLOW_ANY_SIZE", "1")

import jax
import jax.numpy as jnp

from benchmarks.breakdown import scan_time
from gan_tpu.config import CycleGANConfig
from gan_tpu.train.cyclegan_trainer import CycleGANTrainer


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    img = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    k = int(sys.argv[3]) if len(sys.argv) > 3 else 32

    cfg = CycleGANConfig(input_images="", target_images="", output="",
                         img_size=img, batch_size=batch, train=True, epochs=1,
                         dtype="bf16", num_devices=1)
    cfg.validate()
    t = CycleGANTrainer(cfg, mesh=None)
    key = jax.random.PRNGKey(0)
    dt = cfg.compute_dtype
    x0 = jax.random.uniform(key, (batch, img, img, 1), dtype=dt, minval=-1, maxval=1)
    y0 = jax.random.uniform(jax.random.fold_in(key, 1), x0.shape, dtype=dt,
                            minval=-1, maxval=1)
    gp, fp = t.params["gen_g"], t.params["gen_f"]
    dxp, dyp = t.params["disc_x"], t.params["disc_y"]
    k1, k2 = jax.random.split(key)

    def gen_apply(p, z, rk):
        return t.gen.apply(p, z, rng=rk, compute_dtype=dt)

    vgen = jax.vmap(gen_apply)
    stacked_g = jax.tree_util.tree_map(lambda a, b: jnp.stack([a, b]), gp, fp)
    stacked_d = jax.tree_util.tree_map(lambda a, b: jnp.stack([a, b]), dxp, dyp)

    results = {}

    # ---- generator work per step: sequential 3-pass structure ----------
    def g_seq(carry, i):
        (g, f), c = carry
        ki = jax.random.fold_in(key, i)
        ka, kb, kc = jax.random.split(ki, 3)
        p1 = gen_apply(g, jnp.concatenate([x0 + c, y0], 0), ka)       # 2B
        fake_y = p1[:batch]
        p2 = gen_apply(f, jnp.concatenate([fake_y, y0, x0 + c], 0), kb)  # 3B
        fake_x = p2[batch:2 * batch]
        p3 = gen_apply(g, fake_x, kc)                                  # B
        out = (jnp.sum(p1.astype(jnp.float32)) + jnp.sum(p2.astype(jnp.float32))
               + jnp.sum(p3.astype(jnp.float32)))
        return ((g, f), (out * 1e-9).astype(dt))

    results["gen_seq_fwd"] = scan_time(g_seq, ((gp, fp), jnp.zeros((), dt)), k)

    # ---- generator work per step: stacked 2-pass structure -------------
    def g_stk(carry, i):
        sg_, c = carry
        ki = jax.random.fold_in(key, i)
        ka, kb = jax.random.split(ki)
        # level 1: lane0 = G([x, y]), lane1 = F([y, x])  (width 2 x 2B)
        l1_in = jnp.stack([jnp.concatenate([x0 + c, y0], 0),
                           jnp.concatenate([y0, x0 + c], 0)])
        l1 = vgen(sg_, l1_in, jax.random.split(ka))
        fake_y = l1[0, :batch]
        fake_x = l1[1, :batch]
        # level 2: lane0 = G(fake_x), lane1 = F(fake_y)  (width 2 x B)
        l2 = vgen(sg_, jnp.stack([fake_x, fake_y]), jax.random.split(kb))
        out = jnp.sum(l1.astype(jnp.float32)) + jnp.sum(l2.astype(jnp.float32))
        return (sg_, (out * 1e-9).astype(dt))

    results["gen_stk_fwd"] = scan_time(g_stk, (stacked_g, jnp.zeros((), dt)), k)

    # ---- same, forward+backward (grads wrt the generator params) -------
    def grad_of(fn):
        def body(carry, i):
            p, c = carry
            def loss(pp):
                _, o = fn((pp, c), i)
                return o.astype(jnp.float32)
            gr = jax.grad(loss)(p)
            s = sum(jnp.sum(l.astype(jnp.float32))
                    for l in jax.tree_util.tree_leaves(gr))
            return (p, c + (s * 1e-20).astype(dt))
        return body

    results["gen_seq_fwdbwd"] = scan_time(
        grad_of(g_seq), ((gp, fp), jnp.zeros((), dt)), k)
    results["gen_stk_fwdbwd"] = scan_time(
        grad_of(g_stk), (stacked_g, jnp.zeros((), dt)), k)

    # ---- discriminator work per step ------------------------------------
    # three structures: 4 separate B-wide applications (the pre-r3 form),
    # 2 concat-batched 2B passes (shipped, _disc_pass), 1 stacked 2-lane pass
    def d_4x(carry, i):
        (dx, dy), c = carry
        outs = [t.disc.apply(dx, x0 + c, compute_dtype=dt),
                t.disc.apply(dx, y0 + c, compute_dtype=dt),
                t.disc.apply(dy, y0, compute_dtype=dt),
                t.disc.apply(dy, x0 + c, compute_dtype=dt)]
        out = sum(jnp.sum(o.astype(jnp.float32)) for o in outs)
        return ((dx, dy), (out * 1e-9).astype(dt))

    def d_seq(carry, i):
        (dx, dy), c = carry
        o1 = t.disc.apply(dx, jnp.concatenate([x0 + c, y0], 0), compute_dtype=dt)
        o2 = t.disc.apply(dy, jnp.concatenate([y0, x0 + c], 0), compute_dtype=dt)
        out = jnp.sum(o1.astype(jnp.float32)) + jnp.sum(o2.astype(jnp.float32))
        return ((dx, dy), (out * 1e-9).astype(dt))

    vdisc = jax.vmap(lambda p, z: t.disc.apply(p, z, compute_dtype=dt))

    def d_stk(carry, i):
        sd, c = carry
        zin = jnp.stack([jnp.concatenate([x0 + c, y0], 0),
                         jnp.concatenate([y0, x0 + c], 0)])
        o = vdisc(sd, zin)
        return (sd, (jnp.sum(o.astype(jnp.float32)) * 1e-9).astype(dt))

    results["disc_4x_fwd"] = scan_time(d_4x, ((dxp, dyp), jnp.zeros((), dt)), k)
    results["disc_seq_fwd"] = scan_time(d_seq, ((dxp, dyp), jnp.zeros((), dt)), k)
    results["disc_stk_fwd"] = scan_time(d_stk, (stacked_d, jnp.zeros((), dt)), k)
    results["disc_4x_fwdbwd"] = scan_time(
        grad_of(d_4x), ((dxp, dyp), jnp.zeros((), dt)), k)
    results["disc_seq_fwdbwd"] = scan_time(
        grad_of(d_seq), ((dxp, dyp), jnp.zeros((), dt)), k)
    results["disc_stk_fwdbwd"] = scan_time(
        grad_of(d_stk), (stacked_d, jnp.zeros((), dt)), k)

    print(f"stacked-pass bench batch={batch} img={img} dtype=bf16 "
          f"(per-iteration device time)")
    for name, v in results.items():
        print(f"  {name:16s} {v * 1e3:8.2f} ms")
    for kind in ("fwd", "fwdbwd"):
        for net in ("gen", "disc"):
            a, b = results[f"{net}_seq_{kind}"], results[f"{net}_stk_{kind}"]
            print(f"  {net} {kind}: stacked/seq = {b / a:.3f}x "
                  f"({'stacked wins' if b < a else 'seq wins'})")


if __name__ == "__main__":
    main()
