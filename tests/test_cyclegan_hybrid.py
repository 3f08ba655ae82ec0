"""CycleGAN hybrid (resident-prefix + streamed-tail) epochs.

Corpora beyond CycleGAN's flat ceiling (loader.CYCLEGAN_FLAT_SAFE_BYTES,
4.2 GB dual-domain — the 25.4k/domain reference corpus fits flat since
epoch segmentation) run hybrid: both domains keep an equal batch-multiple
resident prefix, tails stream with overlapped transfers.
Sampling shuffles within the resident and tail partitions independently
(documented bounded-mixing deviation); each row is visited at most once per
epoch, exactly once for the shorter domain — pinned here via the step
structure and the tail orders.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gan_tpu.config import CycleGANConfig
from gan_tpu.data import loader
from gan_tpu.train import loop
from gan_tpu.train.cyclegan_trainer import CycleGANTrainer


def _cfg(ndev=1, batch=8):
    cfg = CycleGANConfig(input_images="x", target_images="y", output="o",
                         img_size=32, batch_size=batch, train=True, epochs=1,
                         dtype="fp32", num_devices=ndev)
    cfg.validate()
    return cfg


def _domain(n, seed):
    return np.random.default_rng(seed).integers(
        0, 255, (n, 62, 62, 1), dtype=np.uint8)


@pytest.mark.parametrize("ndev", [1, 8])
def test_hybrid_epoch_step_structure_and_updates(ndev):
    """Hybrid zip epoch emits the reference step count (full steps + zip
    tail), finite losses, and updates params; the streamed tail uses step
    indices continuing the scan's (RNG continuity)."""
    nx, ny = 43, 35  # zip: 4 full steps + tail (ny % b = 3)
    x, y = _domain(nx, 0), _domain(ny, 1)
    tr = CycleGANTrainer(_cfg(ndev))
    n_res = 16  # 2 scan steps; 2 streamed + tail
    res_x, res_y = x[:n_res], y[:n_res]
    caches = {"x": loop.put_cache(res_x, tr.mesh, storage="flat"),
              "y": loop.put_cache(res_y, tr.mesh, storage="flat")}
    p0 = jax.tree_util.tree_map(np.asarray, tr.params)
    losses = tr._run_epoch_hybrid(caches, res_x, res_y, x, y,
                                  jax.random.PRNGKey(3), training=True,
                                  rng=np.random.default_rng(7))
    from gan_tpu.losses import CYCLEGAN_LOSS_KEYS as KEYS
    # reference zip: min(ceil(43/8), ceil(35/8)) = 5 steps
    assert losses.shape == (5, len(KEYS))
    assert np.isfinite(losses).all()
    moved = jax.tree_util.tree_map(
        lambda a, b: np.abs(np.asarray(a) - b).max(), tr.params, p0)
    assert max(jax.tree_util.tree_leaves(moved)) > 0


def test_hybrid_resident_rows_budget(monkeypatch):
    tr = CycleGANTrainer(_cfg())
    x, y = _domain(40, 0), _domain(33, 1)
    # off-TPU default: disabled
    assert tr._hybrid_resident_rows(x, y) == 0
    row = -(-62 * 62 // 128) * 128  # 3968
    # budget for 2*20 rows -> per-domain 20 -> batch-multiple 16
    monkeypatch.setenv("GAN_TPU_FLAT_CACHE_MAX", str(2 * 20 * row))
    assert tr._hybrid_resident_rows(x, y) == 16
    # capped by the SHORTER domain, then batch-rounded
    monkeypatch.setenv("GAN_TPU_FLAT_CACHE_MAX", str(1 << 40))
    assert tr._hybrid_resident_rows(x, y) == 32
    # reserved bytes shrink it
    monkeypatch.setenv("GAN_TPU_FLAT_CACHE_MAX", str(2 * 20 * row))
    assert tr._hybrid_resident_rows(x, y, reserved_bytes=2 * 10 * row) == 8
    # HYBRID_RESIDENT_MARGIN keeps headroom under the flat budget: at batch 4
    # a 2·20-row budget yields 20·0.8 = 16 resident rows, not 20 (the pure-
    # flat bracket crashed mid-hybrid-epoch at 100.6% occupancy, r3)
    tr4 = CycleGANTrainer(_cfg(batch=4))
    assert tr4._hybrid_resident_rows(x, y) == 16


def test_fit_takes_cyclegan_hybrid_path(tmp_path, monkeypatch):
    rng = np.random.default_rng(0)
    x, y = _domain(24, 0), _domain(20, 1)
    vx, vy = (rng.integers(0, 255, (4, 32, 32, 1), np.uint8) for _ in range(2))
    test = rng.integers(0, 255, (2, 32, 32, 1), np.uint8)
    monkeypatch.setattr(loader, "device_cache_fits", lambda *a, **k: False)
    row = -(-62 * 62 // 128) * 128
    vrow = -(-32 * 32 // 128) * 128
    # val (flat) + 10 rows/domain headroom: HYBRID_RESIDENT_MARGIN (0.8)
    # leaves 8 resident rows/domain for train
    monkeypatch.setenv("GAN_TPU_FLAT_CACHE_MAX",
                       str(2 * 32 * vrow + 2 * 10 * row))

    tr = CycleGANTrainer(_cfg(batch=8))
    calls = []
    orig = CycleGANTrainer._run_epoch_hybrid

    def spy(self, *a, **k):
        calls.append(1)
        return orig(self, *a, **k)

    monkeypatch.setattr(CycleGANTrainer, "_run_epoch_hybrid", spy)
    tr_cost, va_cost = tr.fit(x, y, vx, vy, test, str(tmp_path))
    assert calls
    for k, v in tr_cost.items():
        assert np.isfinite(v).all()


def test_rotation_plan_properties():
    """loop.rotation_plan: pure in (args), FIFO stride diffs, and — the
    round-5 fix for the frozen-partition deviation — every block pair shares
    a partition (co-resident or co-streamed) at some epoch of a full cycle."""
    M, m_res, stride = 11, 6, 2
    plans = [loop.rotation_plan(M, m_res, stride, e) for e in range(M + 3)]
    for e, p in enumerate(plans):
        assert len(p) == m_res and len(set(p.tolist())) == m_res
        assert set(p.tolist()) <= set(range(M))
        # purity: replay reproduces (rewind/resume correctness)
        assert np.array_equal(p, loop.rotation_plan(M, m_res, stride, e))
        if e:
            assert (plans[e - 1] != p).sum() <= stride  # bounded refresh
    assert any((plans[0] != p).any() for p in plans[1:])  # partition moves
    mixed = np.zeros((M, M), bool)
    for p in plans:
        res = set(p.tolist())
        strm = set(range(M)) - res
        for grp in (res, strm):
            g = sorted(grp)
            for a in g:
                mixed[a, g] = True
    assert mixed.all(), "some block pair never shares a partition"
    # degenerate cases: nothing streams / zero stride -> identity partition
    assert np.array_equal(loop.rotation_plan(4, 4, 1, 9), np.arange(4))
    assert np.array_equal(loop.rotation_plan(8, 4, 0, 9), np.arange(4))


@pytest.mark.parametrize("ndev", [1, 8])
@pytest.mark.parametrize("chunked", [False, True])
def test_update_cache_rows_equals_rebuild(ndev, chunked, monkeypatch):
    """loop.update_cache_rows on a FlatCache ≡ rebuilding the cache from the
    row-updated host array — across strip columns, row chunks, and mesh
    sizes (the hybrid-rotation refresh's correctness contract)."""
    from gan_tpu.parallel.mesh import make_mesh

    monkeypatch.setattr(loop, "FLAT_STRIP_BYTES", 1024)          # multi-strip
    if chunked:
        monkeypatch.setattr(loop, "CHUNK_LIMIT_BYTES", 16 * 4096)  # multi-chunk
    mesh = make_mesh(ndev)
    rng = np.random.default_rng(0)
    data = rng.integers(0, 255, (64, 50, 50, 1), dtype=np.uint8)
    cache = loop.put_cache(data, mesh, storage="flat")
    if chunked:
        assert isinstance(cache.strips[0], tuple)  # chunking actually engaged
    new_rows = rng.integers(0, 255, (16, 50, 50, 1), dtype=np.uint8)
    pos0 = 24
    cache2 = loop.update_cache_rows(cache, new_rows, pos0, mesh)
    updated = data.copy()
    updated[pos0:pos0 + 16] = new_rows
    ref = loop.put_cache(updated, mesh, storage="flat")
    fetch = jax.jit(lambda c: loop.fetch_rows(c, jnp.arange(64), "take"))
    np.testing.assert_array_equal(np.asarray(fetch(cache2)),
                                  np.asarray(fetch(ref)))


def test_fit_hybrid_rotation_rotates_and_is_deterministic(tmp_path, monkeypatch):
    """A multi-epoch hybrid fit rotates the resident partition (tail row
    sets differ across epochs, union with resident rows covers every row)
    and is bit-deterministic across identical runs (the refresh path replays
    purely from (seed, epoch))."""
    rng = np.random.default_rng(3)
    x, y = _domain(24, 0), _domain(20, 1)
    vx, vy = (rng.integers(0, 255, (4, 32, 32, 1), np.uint8) for _ in range(2))
    test = rng.integers(0, 255, (2, 32, 32, 1), np.uint8)
    monkeypatch.setattr(loader, "device_cache_fits", lambda *a, **k: False)
    row = -(-62 * 62 // 128) * 128
    vrow = -(-32 * 32 // 128) * 128
    monkeypatch.setenv("GAN_TPU_FLAT_CACHE_MAX",
                       str(2 * 32 * vrow + 2 * 10 * row))

    def run(out):
        cfg = _cfg(batch=8)
        cfg.epochs = 3
        tr = CycleGANTrainer(cfg)
        tails = []
        orig = CycleGANTrainer._run_epoch_hybrid

        def spy(self, caches, rx, ry, xx, yy, key, **kw):
            if kw.get("training") and kw.get("tail_rows") is not None:
                tails.append(tuple(np.sort(r) for r in kw["tail_rows"]))
            return orig(self, caches, rx, ry, xx, yy, key, **kw)

        monkeypatch.setattr(CycleGANTrainer, "_run_epoch_hybrid", spy)
        tc, vc = tr.fit(x, y, vx, vy, test, str(tmp_path / out))
        monkeypatch.setattr(CycleGANTrainer, "_run_epoch_hybrid", orig)
        return tr, tails, tc

    tr1, tails1, cost1 = run("a")
    assert tr1._rot is not None and len(tails1) == 3
    n_res = 8  # 10-row budget * 0.8 margin -> batch-rounded 8
    for e, (tx, ty) in enumerate(tails1):
        # exactly-once coverage: resident ∪ streamed == all rows, disjoint
        rx = tr1._hybrid_resident_rows_for("x", e)
        ry = tr1._hybrid_resident_rows_for("y", e)
        assert sorted(np.concatenate([rx, tx]).tolist()) == list(range(24))
        assert sorted(np.concatenate([ry, ty]).tolist()) == list(range(20))
    # the partition MOVES across epochs
    assert any(not np.array_equal(tails1[0][0], t[0]) for t in tails1[1:])

    tr2, tails2, cost2 = run("b")
    assert cost1 == cost2  # deterministic incl. the refresh path
    for (a1, b1), (a2, b2) in zip(tails1, tails2):
        assert np.array_equal(a1, a2) and np.array_equal(b1, b2)


@pytest.mark.slow
def test_hybrid_rotation_fault_rewind_matches_clean(tmp_path, monkeypatch):
    """FaultFence rewind during a ROTATED hybrid fit: the refresh replays
    purely from the epoch index (loop.rotation_plan + _sync_hybrid_rotation
    diffing), so the re-run reproduces the clean run's metrics exactly even
    though the device cache held a different epoch's partition when the
    fault hit."""
    from gan_tpu.train.checkpoint import CheckpointManager

    rng = np.random.default_rng(5)
    x, y = _domain(24, 0), _domain(20, 1)
    vx, vy = (rng.integers(0, 255, (4, 32, 32, 1), np.uint8) for _ in range(2))
    test = rng.integers(0, 255, (2, 32, 32, 1), np.uint8)
    monkeypatch.setattr(loader, "device_cache_fits", lambda *a, **k: False)
    row = -(-62 * 62 // 128) * 128
    vrow = -(-32 * 32 // 128) * 128
    monkeypatch.setenv("GAN_TPU_FLAT_CACHE_MAX",
                       str(2 * 32 * vrow + 2 * 10 * row))

    def run(out, fault_at=None):
        cfg = _cfg(batch=8)
        cfg.epochs = 4
        cfg.checkpoint_every = 1
        tr = CycleGANTrainer(cfg)
        if fault_at is not None:
            seen = {"n": 0}
            orig = CycleGANTrainer._run_epoch_hybrid

            def faulty(self, *a, **kw):
                if kw.get("training"):
                    i = seen["n"]
                    seen["n"] += 1
                    if i == fault_at:
                        raise RuntimeError("injected fault mid-rotation")
                return orig(self, *a, **kw)

            monkeypatch.setattr(CycleGANTrainer, "_run_epoch_hybrid", faulty)
        mgr = CheckpointManager(str(tmp_path / out / "ck"), max_to_keep=3)
        tc, vc = tr.fit(x, y, vx, vy, test, str(tmp_path / out),
                        checkpoint_manager=mgr)
        if fault_at is not None:
            monkeypatch.setattr(CycleGANTrainer, "_run_epoch_hybrid", orig)
        assert tr._rot is not None  # the rotated path actually ran
        return tc, vc

    clean_t, clean_v = run("clean")
    fault_t, fault_v = run("faulted", fault_at=2)  # rewind crosses partitions
    assert fault_t == clean_t and fault_v == clean_v


def test_hybrid_tail_orders_cover_each_row_once(monkeypatch):
    """The tail partition draws exactly the rows the resident prefix does
    not hold, each at most once (exactly once for the shorter domain) —
    captured from the streamed producer's orders."""
    nx, ny = 43, 35
    x, y = _domain(nx, 0), _domain(ny, 1)
    tr = CycleGANTrainer(_cfg(1))
    n_res = 16
    caches = {"x": loop.put_cache(x[:n_res], tr.mesh, storage="flat"),
              "y": loop.put_cache(y[:n_res], tr.mesh, storage="flat")}
    seen = {}
    orig = CycleGANTrainer._stream_batches

    def spy(self, xx, yy, perm_x, perm_y, **kw):
        seen["x"], seen["y"] = np.array(perm_x), np.array(perm_y)
        seen["kw"] = dict(kw)
        return orig(self, xx, yy, perm_x, perm_y, **kw)

    monkeypatch.setattr(CycleGANTrainer, "_stream_batches", spy)
    tr._run_epoch_hybrid(caches, x[:n_res], y[:n_res], x, y,
                         jax.random.PRNGKey(0), training=True,
                         rng=np.random.default_rng(0))
    assert sorted(seen["x"]) == list(range(n_res, nx))
    assert sorted(seen["y"]) == list(range(n_res, ny))
    assert seen["kw"]["start_step"] == n_res // 8
    assert seen["kw"]["n_total"] == 5
