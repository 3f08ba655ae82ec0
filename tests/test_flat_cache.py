"""FLAT device-cache storage (train/loop.py FlatCache).

Flat storage exists because the reference-scale corpus (25,472 pairs,
4.17 GB raw) exceeds the TPU worker's argument-bytes fault ceiling in the
tile-padded image layout (5.63 GB) but not stored flat — measured round 3:
the whole corpus trains at 1,356 img/s/chip flat vs 234 img/s/chip streamed.
These tests pin (1) bit-exactness of flat epochs against tiled ones at mesh
size 1 and 8, and (2) the three-tier storage policy
(data.loader.plan_cache_storage).
"""

import numpy as np
import jax
import pytest

from gan_tpu.config import Pix2PixConfig
from gan_tpu.data import loader
from gan_tpu.parallel.mesh import make_mesh
from gan_tpu.train import loop
from gan_tpu.train.pix2pix_trainer import Pix2PixTrainer


def _cfg(ndev):
    return Pix2PixConfig(data="x", output="y", img_size=32, batch_size=16,
                         epochs=1, num_devices=ndev)


@pytest.mark.parametrize("ndev", [1, 8])
def test_flat_epoch_matches_tiled_exactly(ndev):
    """A scanned training epoch over a FlatCache produces bit-identical
    losses and params to the tiled cache — same gather indices, same RNG
    streams, only the storage layout differs."""
    n = 40
    cache = np.random.default_rng(0).integers(
        0, 255, size=(n, 2, 62, 62, 1), dtype=np.uint8)
    key = jax.random.PRNGKey(7)

    results = {}
    for storage in ("tiled", "flat"):
        tr = Pix2PixTrainer(_cfg(ndev))
        dev = loop.put_cache(cache, tr.mesh, storage=storage)
        if storage == "flat":
            assert isinstance(dev, loop.FlatCache)
            assert dev.sample_shape == (2, 62, 62, 1)
        losses = tr._run_epoch(dev, cache, key, training=True,
                               fixed_order=True, rng=np.random.default_rng(1))
        results[storage] = (losses,
                            jax.tree_util.tree_map(np.asarray, tr.params))

    lt, pt = results["tiled"]
    lf, pf = results["flat"]
    np.testing.assert_array_equal(lt, lf)
    jax.tree_util.tree_map(np.testing.assert_array_equal, pt, pf)


def test_flat_cache_chunking_round_trip():
    """fetch_rows over a multi-chunk FlatCache returns the exact original
    rows (forced chunking via a tiny CHUNK_LIMIT_BYTES)."""
    n, sample = 24, (2, 10, 10, 1)
    cache = np.random.default_rng(3).integers(
        0, 255, size=(n,) + sample, dtype=np.uint8)
    mesh = make_mesh(1)
    orig = loop.CHUNK_LIMIT_BYTES
    loop.CHUNK_LIMIT_BYTES = 1000  # rows are 200 B -> several chunks
    try:
        dev = loop.put_cache(cache, mesh, storage="flat")
        assert isinstance(dev.strips[0], tuple) and len(dev.strips[0]) > 1
    finally:
        loop.CHUNK_LIMIT_BYTES = orig
    idxs = np.array([0, 7, 23, 5], np.int32)
    rows = jax.jit(lambda c, i: loop.fetch_rows(c, i, "take"))(dev, idxs)
    np.testing.assert_array_equal(np.asarray(rows), cache[idxs])


def test_flat_cache_nbytes():
    # (N to 32-sublane tile) x (row bytes to 128-lane tile)
    assert loop.flat_cache_nbytes((40, 2, 62, 62, 1)) == 64 * (-(-7688 // 128) * 128)
    # reference corpus: 4.17 GB flat vs 5.63 GB tile-padded
    ref = (25472, 2, 286, 286, 1)
    assert loop.flat_cache_nbytes(ref) < 4.2e9 < 5.6e9 < loop.padded_cache_nbytes(ref)


class _FakeDev:
    platform = "tpu"

    def memory_stats(self):
        return None


class _FakeMesh:
    size = 1

    def __init__(self):
        class _F:
            flat = [_FakeDev()]
        self.devices = _F()


def test_plan_cache_storage_tiers(monkeypatch):
    mesh = _FakeMesh()
    shp = (100, 2, 286, 286, 1)       # ~16 MB raw
    big = (25472, 2, 286, 286, 1)     # 4.17 GB raw / 5.63 GB tiled
    huge = (60000, 2, 286, 286, 1)    # 9.8 GB raw — beyond flat too

    # tiled when everything fits tile-padded
    assert loader.plan_cache_storage([[shp], [shp]], mesh) == ["tiled", "tiled"]
    # flat when tiled doesn't fit but raw bytes do (the reference corpus)
    assert loader.plan_cache_storage([[big]], mesh) == ["flat"]
    # largest-first greedy when only part fits the flat budget: train takes
    # it; val still caches TILED on its own (each group runs its own epoch
    # program and the fault bracket binds per-program — round-3 review fix)
    val = (9000, 2, 286, 286, 1)      # 1.47 GB — train+val flat > ceiling
    assert loader.plan_cache_storage([[big], [val]], mesh) == ["flat", "tiled"]
    # a leftover group too big even for tiled alone still streams
    val_big = (22000, 2, 286, 286, 1)  # 4.86 GB tiled > tiled ceiling
    assert loader.plan_cache_storage([[big], [val_big]], mesh) == ["flat", "stream"]
    # beyond the flat ceiling entirely -> stream
    assert loader.plan_cache_storage([[huge]], mesh) == ["stream"]
    # mode switches
    assert loader.plan_cache_storage([[big]], mesh, "off") == ["stream"]
    assert loader.plan_cache_storage([[huge]], mesh, "on") == ["flat"]
    # None group (FileCache) always streams, others unaffected
    assert loader.plan_cache_storage([None, [shp]], mesh) == ["stream", "tiled"]
    # env override shrinks the flat budget
    monkeypatch.setenv("GAN_TPU_FLAT_CACHE_MAX", "1000000")
    assert loader.plan_cache_storage([[big]], mesh) == ["stream"]


def test_plan_cache_storage_cpu_flat_disabled():
    """Off-TPU there is no fault ceiling — flat is never auto-chosen (tiled
    or stream only), but the env override can still force the budget for
    tests."""
    mesh = make_mesh(1)
    assert mesh.devices.flat[0].platform != "tpu"
    big = (60000, 2, 286, 286, 1)
    plan = loader.plan_cache_storage([[big]], mesh)
    assert plan[0] in ("tiled", "stream")
    assert "flat" not in plan


@pytest.mark.parametrize("ndev", [1, 4])
def test_hybrid_epoch_matches_cached_epoch(ndev):
    """A resident-prefix + streamed-tail epoch reproduces a fully cached one
    (same fixed-order batches, same per-step RNG streams): losses to ~1e-4
    rel, params to ~1e-3 (XLA fusion/summation-order noise between the scan
    and per-batch programs, as in test_streaming)."""
    n, b = 43, 8  # 5 full batches + remainder 3; resident prefix 24 rows
    cache = np.random.default_rng(5).integers(
        0, 255, size=(n, 2, 62, 62, 1), dtype=np.uint8)
    key = jax.random.PRNGKey(11)

    def cfg():
        c = Pix2PixConfig(data="x", output="y", img_size=32, batch_size=b,
                          epochs=1, dtype="fp32", num_devices=ndev)
        c.validate()
        return c

    t_cached = Pix2PixTrainer(cfg())
    dev = loop.put_cache(cache, t_cached.mesh)
    l_cached = t_cached._run_epoch(dev, cache, key, training=True,
                                   fixed_order=True,
                                   rng=np.random.default_rng(0))

    t_hyb = Pix2PixTrainer(cfg())
    n_res = 24
    res_host = cache[:n_res]
    res_dev = loop.put_cache(res_host, t_hyb.mesh, storage="flat")
    l_hyb = t_hyb._run_epoch_hybrid(res_dev, res_host, cache, key,
                                    training=True,
                                    rng=np.random.default_rng(0))

    assert l_cached.shape == l_hyb.shape == (6, 4)
    np.testing.assert_allclose(l_cached, l_hyb, rtol=1e-4, atol=1e-5)
    jax.tree_util.tree_map(
        lambda a, c: np.testing.assert_allclose(np.asarray(a), np.asarray(c),
                                                rtol=1e-3, atol=1e-3),
        t_cached.params, t_hyb.params)


def test_hybrid_resident_rows_budget(monkeypatch):
    cfg = Pix2PixConfig(data="x", output="y", img_size=32, batch_size=8,
                        epochs=1, num_devices=1)
    tr = Pix2PixTrainer(cfg)
    cache = np.zeros((43, 2, 62, 62, 1), np.uint8)  # padded row = 7808 B
    # default budget off-TPU (no env) -> hybrid disabled
    assert tr._hybrid_resident_rows(cache) == 0
    # budget for 30 rows -> 0.8 HYBRID_RESIDENT_MARGIN -> 24 (a batch multiple)
    monkeypatch.setenv("GAN_TPU_FLAT_CACHE_MAX", str(30 * 7808))
    assert tr._hybrid_resident_rows(cache) == 24
    # reserved bytes shrink it: (30-10) rows * 0.8 = 16
    assert tr._hybrid_resident_rows(cache, reserved_bytes=10 * 7808) == 16
    # huge budget caps at the largest batch multiple <= n
    monkeypatch.setenv("GAN_TPU_FLAT_CACHE_MAX", str(1 << 40))
    assert tr._hybrid_resident_rows(cache) == 40


def test_fit_takes_hybrid_path(tmp_path, monkeypatch):
    """fit() engages the hybrid epoch when the corpus exceeds both device
    ceilings but a prefix fits the flat budget; losses stay finite and the
    output contract holds."""
    rng = np.random.default_rng(0)
    train = rng.integers(0, 255, (20, 2, 62, 62, 1), dtype=np.uint8)
    val = rng.integers(0, 255, (4, 2, 32, 32, 1), dtype=np.uint8)
    test = rng.integers(0, 255, (2, 2, 32, 32, 1), dtype=np.uint8)
    monkeypatch.setattr(loader, "device_cache_fits", lambda *a, **k: False)
    # budget: val reserves flat_cache_nbytes((4,2,32,32,1)) = 32*2048; the
    # remaining 20 rows' worth shrinks by HYBRID_RESIDENT_MARGIN (0.8) to a
    # 16-row train prefix — the margin is part of the sizing contract
    monkeypatch.setenv("GAN_TPU_FLAT_CACHE_MAX", str(32 * 2048 + 20 * 7808))

    cfg = Pix2PixConfig(data="x", output="y", img_size=32, batch_size=8,
                        epochs=1, num_devices=1)
    tr = Pix2PixTrainer(cfg)
    hybrid_calls = []
    orig = Pix2PixTrainer._run_epoch_hybrid

    def spy(self, *a, **k):
        hybrid_calls.append(1)
        return orig(self, *a, **k)

    monkeypatch.setattr(Pix2PixTrainer, "_run_epoch_hybrid", spy)
    tr_cost, va_cost = tr.fit(train, val, test, str(tmp_path))
    assert hybrid_calls  # hybrid path actually ran
    for k, v in tr_cost.items():
        assert np.isfinite(v).all()


def test_trainer_fit_uses_flat_plan(tmp_path, monkeypatch):
    """End-to-end: with the tiled ceiling squeezed below the corpus and the
    flat budget above it, fit() takes the FlatCache path and trains."""
    monkeypatch.setenv("GAN_TPU_FLAT_CACHE_MAX", str(1 << 30))

    orig = loader.device_cache_fits
    monkeypatch.setattr(loader, "device_cache_fits", lambda *a, **k: False)
    cfg = Pix2PixConfig(data="x", output="y", img_size=32, batch_size=8,
                        epochs=1, num_devices=1)
    tr = Pix2PixTrainer(cfg)
    assert tr._storage_plan(np.zeros((16, 2, 62, 62, 1), np.uint8)) == ["flat"]
    monkeypatch.setattr(loader, "device_cache_fits", orig)

    rng = np.random.default_rng(0)
    train = rng.integers(0, 255, (16, 2, 62, 62, 1), dtype=np.uint8)
    val = rng.integers(0, 255, (8, 2, 32, 32, 1), dtype=np.uint8)
    test = rng.integers(0, 255, (2, 2, 32, 32, 1), dtype=np.uint8)
    put_calls = []
    orig_put = loop.put_cache

    def spy(cache_np, mesh, **kw):
        put_calls.append(kw.get("storage", "tiled"))
        return orig_put(cache_np, mesh, **kw)

    monkeypatch.setattr(loop, "put_cache", spy)
    monkeypatch.setattr(loader, "device_cache_fits", lambda *a, **k: False)
    tr_cost, va_cost = tr.fit(train, val, test, str(tmp_path))
    assert put_calls == ["flat", "flat"]
    for k, v in tr_cost.items():
        assert np.isfinite(v).all()
