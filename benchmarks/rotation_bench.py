#!/usr/bin/env python3
"""Hybrid residency-rotation throughput A/B (VERDICT r4 next #3's ≤5%
budget, measured): CycleGAN fit() epochs on a forced-hybrid corpus with the
partition frozen (GAN_TPU_HYBRID_ROTATE=0), rotating at a reference-like
stride, and rotating at the aggressive default (corpus wraps once per run).

Per-epoch wall time is captured around the refresh + hybrid epoch (the
refresh's update_cache_rows uploads ride the same tunnel as the overlapped
tail stream). Expectation: stride·block/tail ≈ the extra transfer fraction
(~6% at the stride-2 arm here, ~2.5% at reference scale), mostly hidden
under the resident scan's compute.

Usage: python benchmarks/rotation_bench.py [rows_per_domain] [batch] [--save]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("GAN_TPU_ALLOW_ANY_SIZE", "1")

import numpy as np

from benchmarks._bench_util import hard_sync, heartbeat, install_watchdog, set_phase


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    save = "--save" in sys.argv
    n = int(args[0]) if args else 3072
    batch = int(args[1]) if len(args) > 1 else 32
    epochs = 3
    install_watchdog(float(os.environ.get("BENCH_BUDGET_S", 1350)))

    from gan_tpu.config import CycleGANConfig
    from gan_tpu.parallel.mesh import make_mesh
    from gan_tpu.train.cyclegan_trainer import CycleGANTrainer

    # force the hybrid tier: flat budget sized for ~2/3 of the corpus
    # resident per domain (times the 0.8 margin)
    row = -(-286 * 286 // 128) * 128
    n_res_target = (2 * n) // 3
    os.environ["GAN_TPU_FLAT_CACHE_MAX"] = str(
        int(2 * n_res_target * row / CycleGANTrainer.HYBRID_RESIDENT_MARGIN))
    # tiled must NOT fit or the plan never reaches hybrid at this small scale
    os.environ["GAN_TPU_DEVICE_CACHE_MAX"] = str(100_000_000)

    cfg = CycleGANConfig(input_images="x", target_images="y", output="o",
                         img_size=256, batch_size=batch, train=True,
                         epochs=epochs, dtype="bf16", num_devices=1,
                         save_weights="false", logging="false")
    cfg.validate()
    set_phase("make-data")
    rng = np.random.default_rng(0)
    x = rng.integers(0, 255, (n, 286, 286, 1), np.uint8)
    y = rng.integers(0, 255, (n, 286, 286, 1), np.uint8)
    vx = rng.integers(0, 255, (batch, 256, 256, 1), np.uint8)
    vy = rng.integers(0, 255, (batch, 256, 256, 1), np.uint8)
    test = vx[:1]

    tr = CycleGANTrainer(cfg, mesh=make_mesh(1))
    times: list = []
    orig_sync = CycleGANTrainer._sync_hybrid_rotation
    orig_hyb = CycleGANTrainer._run_epoch_hybrid

    def sync(self, *a, **k):
        self._bench_t0 = time.perf_counter()
        return orig_sync(self, *a, **k)

    def hyb(self, *a, **k):
        if getattr(self, "_bench_t0", None) is None:
            self._bench_t0 = time.perf_counter()
        r = orig_hyb(self, *a, **k)
        if k.get("training"):
            hard_sync(self.params)
            times.append(time.perf_counter() - self._bench_t0)
        self._bench_t0 = None
        return r

    CycleGANTrainer._sync_hybrid_rotation = sync
    CycleGANTrainer._run_epoch_hybrid = hyb

    import tempfile
    results = {}
    arms = [("frozen", {"GAN_TPU_HYBRID_ROTATE": "0"}),
            ("rotate-stride2", {"GAN_TPU_HYBRID_ROTATE": "1",
                                "GAN_TPU_HYBRID_ROTATE_STRIDE": "2"}),
            ("rotate-default", {"GAN_TPU_HYBRID_ROTATE": "1"})]
    for i, (name, env) in enumerate(arms):
        set_phase(f"arm-{name}")
        os.environ.pop("GAN_TPU_HYBRID_ROTATE_STRIDE", None)
        for k, v in env.items():
            os.environ[k] = v
        times.clear()
        out = tempfile.mkdtemp(prefix=f"rot_{name}_")
        tr.fit(x, y, vx, vy, test, out)
        # drop the first epoch of the FIRST arm (compiles)
        eps = times[1:] if i == 0 else list(times)
        # steady state = the LAST epoch: a rotating arm's first epochs pay
        # one-off costs (the _strip_write compile on its first refresh, and
        # cache-put transfers still draining into epoch 0's window)
        results[name] = {"epoch_s": [round(t, 2) for t in eps],
                         "median_s": round(sorted(eps)[len(eps) // 2], 2),
                         "steady_state_s": round(eps[-1], 2)}
        heartbeat(f"{name}: {results[name]}")

    base = results["frozen"]["steady_state_s"]
    report = {
        "description": __doc__.split("\n\n")[0],
        "rows_per_domain": n, "batch": batch, "epochs_per_arm": epochs,
        "img_size": 256, "dtype": "bf16",
        "resident_target_rows": n_res_target,
        "results": results,
        "overhead_vs_frozen_pct_steady_state": {
            k: round(100 * (v["steady_state_s"] - base) / base, 1)
            for k, v in results.items() if k != "frozen"},
    }
    print(json.dumps(report, indent=1))
    if save:
        outp = os.path.join(os.path.dirname(__file__), "results",
                            "rotation_bench.json")
        with open(outp, "w") as f:
            json.dump(report, f, indent=1)
        print(f"wrote {outp}", file=sys.stderr)


if __name__ == "__main__":
    main()
