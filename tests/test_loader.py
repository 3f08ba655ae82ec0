"""Streaming loader and quality-eval utilities."""

import numpy as np
import pytest
from PIL import Image

from gan_tpu.data.loader import (FileCache, StreamingLoader, device_cache_fits,
                                 host_cache_fits, iter_uint8_batches)


def test_streaming_loader_batches(tmp_path):
    rng = np.random.default_rng(0)
    paths = []
    for i in range(10):
        p = str(tmp_path / f"im_{i}.png")
        Image.fromarray(np.full((8, 8), i, np.uint8), "L").save(p)
        paths.append(p)

    def pre(path):
        from gan_tpu.data.decode import decode_image
        return decode_image(path, 1)

    loader = StreamingLoader(paths, pre, batch_size=4)
    assert len(loader) == 3
    batches = list(loader.epoch())
    assert [b.shape[0] for b in batches] == [4, 4, 2]
    # order preserved without a permutation
    assert batches[0][0, 0, 0, 0] == 0 and batches[2][1, 0, 0, 0] == 9
    # permuted epoch covers everything once
    order = np.random.default_rng(1).permutation(10)
    vals = np.concatenate([b[:, 0, 0, 0] for b in loader.epoch(order)])
    assert sorted(vals.tolist()) == list(range(10))
    loader.close()


def test_streaming_loader_surfaces_errors(tmp_path):
    loader = StreamingLoader([str(tmp_path / "missing.png")],
                             lambda p: (_ for _ in ()).throw(IOError("boom")),
                             batch_size=1)
    with pytest.raises(BaseException):
        list(loader.epoch())


def test_device_cache_fits_cpu_fallback():
    from gan_tpu.parallel.mesh import make_mesh
    import jax
    mesh = make_mesh(1, devices=jax.devices("cpu")[:1])
    assert device_cache_fits(1 << 20, mesh)          # 1 MB fits
    assert not device_cache_fits(1 << 45, mesh)      # 32 TB doesn't


def test_file_cache_facade(tmp_path):
    """FileCache mimics the ndarray cache interface and streams the same
    bytes the eager pipeline would produce."""
    rng = np.random.default_rng(0)
    paths = []
    for i in range(7):
        p = str(tmp_path / f"im_{i}.png")
        Image.fromarray(np.full((8, 8), i * 3, np.uint8), "L").save(p)
        paths.append(p)

    def pre(path):
        from gan_tpu.data.decode import decode_image
        return decode_image(path, 1)

    fc = FileCache(paths, pre, sample_shape=(8, 8, 1), batch_size=3)
    assert fc.shape == (7, 8, 8, 1) and len(fc) == 7
    assert fc.nbytes == 7 * 8 * 8
    batches = list(fc.epoch())
    assert [b.shape[0] for b in batches] == [3, 3, 1]
    np.testing.assert_array_equal(fc.rows([2, 5])[:, 0, 0, 0], [6, 15])
    fc.close()


def test_iter_uint8_batches_matches_for_array_and_filecache(tmp_path):
    rng = np.random.default_rng(1)
    arr = rng.integers(0, 255, (10, 4, 4, 1), np.uint8)
    paths = []
    for i in range(10):
        p = str(tmp_path / f"b_{i}.png")
        Image.fromarray(arr[i, :, :, 0], "L").save(p)
        paths.append(p)

    def pre(path):
        from gan_tpu.data.decode import decode_image
        return decode_image(path, 1)

    fc = FileCache(paths, pre, sample_shape=(4, 4, 1), batch_size=4)
    order = np.random.default_rng(2).permutation(10)
    a_batches = list(iter_uint8_batches(arr, 4, order))
    f_batches = list(iter_uint8_batches(fc, 4, order))
    assert len(a_batches) == len(f_batches) == 3
    for a, f in zip(a_batches, f_batches):
        np.testing.assert_array_equal(a, f)
    fc.close()


def test_host_cache_fits():
    assert host_cache_fits(1 << 20, "auto")
    assert host_cache_fits(1 << 50, "on")       # forced on
    assert not host_cache_fits(1, "off")        # forced off
    assert not host_cache_fits(1 << 50, "auto")  # 1 PB never fits


def test_epoch_perm_windowed_shuffle():
    """buffer >= n → full permutation; small buffers keep elements within
    ~buffer of their source position (tf.data windowed-shuffle property)."""
    from gan_tpu.train.loop import epoch_perm

    rng = np.random.default_rng(0)
    full = epoch_perm(100, 99999, rng)
    assert sorted(full.tolist()) == list(range(100))

    rng = np.random.default_rng(0)
    win = epoch_perm(1000, 10, rng)
    assert sorted(win.tolist()) == list(range(1000))
    # element i can appear no earlier than position i - buffer + 1
    pos = np.empty(1000, np.int64)
    pos[win] = np.arange(1000)
    assert np.all(pos >= np.arange(1000) - 9)
    # but it's not the identity either (actually shuffled)
    assert not np.array_equal(win, np.arange(1000))


def test_epoch_perm_matches_scalar_reference():
    """The vectorized buffer chase equals the direct per-step windowed-shuffle
    algorithm (draw from buffer -> refill from stream -> drain) when both
    consume the same random draws."""
    from gan_tpu.train.loop import epoch_perm

    def scalar_ref(n, b, js):
        buf = np.arange(b)
        out = np.empty(n, np.int64)
        nxt, end = b, b
        for i in range(n):
            j = js[i]
            out[i] = buf[j]
            if nxt < n:
                buf[j] = nxt
                nxt += 1
            else:
                end -= 1
                buf[j] = buf[end]
        return out

    for n, b, seed in [(50, 7, 0), (1000, 10, 1), (64, 64, 2), (65, 64, 3),
                       (9, 3, 4)]:
        b = min(b, n)
        ends = np.concatenate(
            [np.full(n - b, b, np.int64), np.arange(b, 0, -1)])
        js = np.random.default_rng(seed).integers(0, ends)
        got = epoch_perm(n, b, np.random.default_rng(seed))
        if b >= n:  # fast path: full permutation, not the windowed algorithm
            assert sorted(got.tolist()) == list(range(n))
        else:
            np.testing.assert_array_equal(got, scalar_ref(n, b, js))


def test_raw_png_names_dedup():
    from gan_tpu.train.pix2pix_trainer import raw_png_names

    names = ["a/img.jpg", "b/img.png", "other.png"]
    out = raw_png_names(names, 3)
    assert out == ["img.png", "img__1.png", "other.png"]
    assert raw_png_names(None, 2) == ["img0.png", "img1.png"]


def test_eval_quality_self_similarity(tmp_path):
    """Identical dirs → zero L1, SSIM 1, near-zero Fréchet proxy."""
    from tools.eval_quality import main as eval_main
    import json, io, contextlib

    rng = np.random.default_rng(2)
    d = tmp_path / "a"
    d.mkdir()
    for i in range(6):
        Image.fromarray(rng.integers(0, 255, (32, 32), np.uint8), "L").save(
            str(d / f"g_{i}.png"))
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        eval_main(["--generated", str(d), "--target", str(d),
                   "--channels", "1", "--img-size", "32"])
    report = json.loads(buf.getvalue())
    assert report["l1"] == 0.0
    assert report["ssim"] > 0.999
    assert report["frechet_proxy"] < 1e-3


def test_iter_uint8_batches_rebatches_filecache(tmp_path):
    """iter_uint8_batches honors the requested batch size over a FileCache
    built with a different construction-time batch size (predict()'s 64-image
    chunking contract — round-2 ADVICE)."""
    from gan_tpu.data.loader import FileCache, iter_uint8_batches

    rng = np.random.default_rng(3)
    samples = rng.integers(0, 255, (11, 8, 8, 1), np.uint8)
    paths = [str(i) for i in range(11)]
    fc = FileCache(paths, lambda p: samples[int(p)], (8, 8, 1), batch_size=3)
    got = list(iter_uint8_batches(fc, 4))
    assert [g.shape[0] for g in got] == [4, 4, 3]
    np.testing.assert_array_equal(np.concatenate(got), samples)
    # matching batch size passes straight through
    got2 = list(iter_uint8_batches(fc, 3))
    assert [g.shape[0] for g in got2] == [3, 3, 3, 2]


def test_val_stream_depth_caps():
    """loader.val_stream_depth: enough depth to drain the whole val set
    under the byte cap, never below the normal double-buffer."""
    from gan_tpu.data.loader import val_stream_depth

    # 10 batches of 1 MB each under a 256 MB default cap -> full drain
    assert val_stream_depth(40, 4, 250_000) == 10
    # byte cap binds: 4 MB cap, 1 MB batches -> 4 deep
    import os
    os.environ["GAN_TPU_VAL_PREFETCH_BYTES"] = "4000000"
    try:
        assert val_stream_depth(40, 4, 250_000) == 4
        # floor: tiny cap still leaves the double-buffer
        os.environ["GAN_TPU_VAL_PREFETCH_BYTES"] = "1"
        assert val_stream_depth(40, 4, 250_000) == 2
    finally:
        del os.environ["GAN_TPU_VAL_PREFETCH_BYTES"]
    # never more than the batch count
    assert val_stream_depth(3, 4, 8) == 2  # 1 batch, floor 2


def test_publish_result_survives_unparsable_stored_line():
    """_bench_util.publish_result's dedup must not choke on a pre-encoded
    non-JSON line already in the store (ADVICE r4 low)."""
    from benchmarks import _bench_util as bu

    saved = list(bu._RESULT_LINES)
    try:
        bu._RESULT_LINES[:] = []
        bu.publish_result("not json at all")
        bu.publish_result({"metric": "m", "value": 1})
        bu.publish_result({"metric": "m", "value": 2})  # dedup replaces
        lines = bu.result_lines()
        assert "not json at all" in lines
        assert sum('"metric": "m"' in l for l in lines) == 1
        assert any('"value": 2' in l for l in lines)
    finally:
        bu._RESULT_LINES[:] = saved
