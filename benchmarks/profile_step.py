#!/usr/bin/env python3
"""Capture a device trace of the Pix2Pix train step and print the top ops.

Uses jax.profiler + the tensorboard_plugin_profile converter to turn the
xplane into an op-level time table — the ground truth for deciding which
fused Pallas kernels are worth writing.

Run: `python benchmarks/profile_step.py [batch] [img_size]`.
"""

from __future__ import annotations

import glob
import gzip
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("GAN_TPU_ALLOW_ANY_SIZE", "1")

import jax
import jax.numpy as jnp
import numpy as np

from gan_tpu.config import Pix2PixConfig
from gan_tpu.parallel.mesh import make_mesh
from gan_tpu.train.pix2pix_trainer import Pix2PixTrainer


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    img = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    cfg = Pix2PixConfig(data="", output="", img_size=img, batch_size=batch,
                        train=True, epochs=1, dtype="bf16", num_devices=1)
    cfg.validate()
    t = Pix2PixTrainer(cfg, mesh=make_mesh(1))
    key = jax.random.PRNGKey(0)
    dt = cfg.compute_dtype
    x = jax.random.uniform(key, (batch, img, img, 1), dtype=dt, minval=-1, maxval=1)
    y = jax.random.uniform(jax.random.fold_in(key, 1), (batch, img, img, 1),
                           dtype=dt, minval=-1, maxval=1)

    @jax.jit
    def steps(params, opt, k):
        def body(c, i):
            p, o = c
            p, o, _ = t._train_step(p, o, (x, y), jax.random.fold_in(k, i))
            return (p, o), ()
        (p, o), _ = jax.lax.scan(body, (params, opt), jnp.arange(8))
        return p, o

    p, o = steps(t.params, t.opt_states, key)  # compile
    jax.block_until_ready(p)

    logdir = tempfile.mkdtemp(prefix="gtprof_")
    with jax.profiler.trace(logdir):
        p, o = steps(p, o, jax.random.fold_in(key, 7))
        jax.block_until_ready(p)

    xplanes = glob.glob(os.path.join(logdir, "**", "*.xplane.pb"), recursive=True)
    if not xplanes:
        print("no xplane captured", logdir)
        return
    from tensorboard_plugin_profile.convert import raw_to_tool_data as rtd
    data, _ = rtd.xspace_to_tool_data([xplanes[0]], "framework_op_stats", {})
    if isinstance(data, bytes):
        data = gzip.decompress(data).decode()
    rows = json.loads(data)
    # rows: list of dicts with occurrences/total time/avg etc.
    print(f"top ops (batch={batch}, img={img}, 8 steps):")
    try:
        table = rows[0]["p"] if isinstance(rows, dict) else rows
    except Exception:
        table = rows
    print(json.dumps(table, indent=1)[:4000])


if __name__ == "__main__":
    main()
