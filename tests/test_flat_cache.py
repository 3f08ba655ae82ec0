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
        assert len(dev.chunks) > 1
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
    # largest-first greedy when only part fits: train flat, val streams
    val = (9000, 2, 286, 286, 1)      # 1.47 GB — train+val flat > ceiling
    assert loader.plan_cache_storage([[big], [val]], mesh) == ["flat", "stream"]
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
