#!/usr/bin/env python3
"""Compile-time peak-HBM probe for the 512² remat frontier.

The axon runtime does not expose ``device.memory_stats()`` (returns
nothing / raises), so benchmarks/remat_frontier.py's runtime
``peak_bytes_in_use`` column came back -1.  This probe gets the memory
picture the other way: AOT-compile the exact training-epoch executable for
each (batch, remat) cell and read XLA's own allocation accounting from
``compiled.memory_analysis()`` — argument / output / temp / alias sizes.
Peak program HBM ≈ arguments + outputs + temps − aliased (donated params
and opt-states alias their outputs).  This is the number the compiler
budgets against, and the one that decides whether a cell OOMs.

Usage: python benchmarks/hbm_probe.py [batch ...] [--save]
Merges ``peak_hbm_gb`` (and the raw breakdown) into
benchmarks/results/remat_frontier.json when --save is given.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("GAN_TPU_ALLOW_ANY_SIZE", "1")

import jax
import numpy as np

from gan_tpu.data.augment import JITTER_PAD
from gan_tpu.parallel.mesh import make_mesh
from gan_tpu.train import loop


def cell(batch: int, remat: str, steps: int = 16) -> dict:
    from gan_tpu.config import Pix2PixConfig
    from gan_tpu.train.pix2pix_trainer import Pix2PixTrainer

    mesh = make_mesh(len(jax.devices()))
    b = batch * mesh.size
    cfg = Pix2PixConfig(data="", output="", img_size=512, batch_size=b,
                        train=True, epochs=1, dtype="bf16",
                        num_devices=mesh.size, remat=remat)
    cfg.validate()
    n = b * steps
    src = 512 + JITTER_PAD
    cache_np = np.random.default_rng(0).integers(0, 255, (n, 2, src, src, 1),
                                                 np.uint8)
    trainer = Pix2PixTrainer(cfg, mesh=mesh)
    cache = loop.put_cache(cache_np, mesh)
    n_steps, b_loc, _ = loop.epoch_plan(n, cfg.batch_size, mesh.size)
    perm = loop.local_perm(n, ndev=mesh.size, n_steps=n_steps,
                           per_dev_batch=b_loc)
    mode = loop.gather_mode(n, fixed_order=True, n_devices=mesh.size)
    fn = trainer._get_epoch_fn(True, mode)
    key = jax.random.PRNGKey(0)
    compiled = fn.lower(trainer.params, trainer.opt_states, cache, perm,
                        key).compile()
    ma = compiled.memory_analysis()
    out = {"batch_per_chip": batch, "remat": remat}
    if ma is None:
        out["peak_hbm_gb"] = None
        return out
    args = getattr(ma, "argument_size_in_bytes", 0)
    outs = getattr(ma, "output_size_in_bytes", 0)
    temp = getattr(ma, "temp_size_in_bytes", 0)
    alias = getattr(ma, "alias_size_in_bytes", 0)
    out.update(
        peak_hbm_gb=round((args + outs + temp - alias) / 1e9, 3),
        hbm_breakdown_gb={
            "arguments": round(args / 1e9, 3),
            "outputs": round(outs / 1e9, 3),
            "temps": round(temp / 1e9, 3),
            "aliased": round(alias / 1e9, 3),
        },
    )
    return out


if __name__ == "__main__":
    save = "--save" in sys.argv
    batches = [int(a) for a in sys.argv[1:] if a != "--save"] or [8, 16, 32, 64]
    results = []
    for batch in batches:
        for remat in ("off", "on"):
            try:
                r = cell(batch, remat)
            except Exception as e:  # OOM at compile time is a data point too
                msg = str(e)
                if "RESOURCE_EXHAUSTED" in msg or "out of memory" in msg.lower():
                    r = {"batch_per_chip": batch, "remat": remat, "oom": True}
                else:
                    raise
            results.append(r)
            print(json.dumps(r), flush=True)
    if save:
        path = os.path.join(os.path.dirname(__file__), "results",
                            "remat_frontier.json")
        with open(path) as f:
            report = json.load(f)
        by_key = {(r["batch_per_chip"], r["remat"]): r for r in results}
        for row in report["remat_frontier_512"]:
            probe = by_key.get((row["batch_per_chip"], row["remat"]))
            if probe:
                row["peak_hbm_gb"] = probe.get("peak_hbm_gb")
                if "hbm_breakdown_gb" in probe:
                    row["hbm_breakdown_gb"] = probe["hbm_breakdown_gb"]
        extra = [r for r in results
                 if not any(row["batch_per_chip"] == r["batch_per_chip"]
                            and row["remat"] == r["remat"]
                            for row in report["remat_frontier_512"])]
        report["remat_frontier_512"].extend(extra)
        report["peak_hbm_method"] = (
            "XLA compiled.memory_analysis(): arguments + outputs + temps - "
            "aliased for the jitted training-epoch executable (the axon "
            "runtime exposes no runtime memory_stats)")
        with open(path, "w") as f:
            json.dump(report, f, indent=2)
        print(f"merged into {path}")
