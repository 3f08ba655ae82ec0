"""Streaming loader and quality-eval utilities."""

import numpy as np
import pytest
from PIL import Image

from gan_tpu.data.loader import StreamingLoader, device_cache_fits


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
