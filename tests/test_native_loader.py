"""Native C++ loader tests: decode parity vs PIL, batch threading, errors."""

import numpy as np
import pytest

from ground_plane_polling_tpu.data import native_loader


@pytest.fixture(scope="module")
def loader():
    if not native_loader.available():
        pytest.skip("native loader toolchain unavailable")
    return native_loader.NativeImageLoader(n_threads=4)


@pytest.fixture(scope="module")
def png_path(tmp_path_factory, ):
    from PIL import Image

    rng = np.random.RandomState(0)
    arr = rng.randint(0, 255, (48, 80, 3), dtype=np.uint8)
    p = tmp_path_factory.mktemp("imgs") / "test.png"
    Image.fromarray(arr).save(str(p))
    return str(p), arr


def test_decode_matches_pil_bgr(loader, png_path):
    path, rgb = png_path
    out = loader.load_image(path, (48, 80), scale=1.0)
    # scale 1.0: exact pixels, channels BGR
    np.testing.assert_array_equal(out.astype(np.uint8), rgb[:, :, ::-1])


def test_image_size_probe(loader, png_path):
    path, rgb = png_path
    assert loader.image_size(path) == (48, 80)


def test_resize_and_pad(loader, tmp_path):
    from PIL import Image

    # smooth gradient: PIL's area-averaging BILINEAR and pure 2x2 bilinear
    # agree closely on smooth content (they differ on per-pixel noise)
    yy, xx = np.mgrid[0:48, 0:80]
    rgb = np.stack([yy * 5 % 256, xx * 3 % 256, (yy + xx) % 256],
                   axis=-1).astype(np.uint8)
    path = str(tmp_path / "grad.png")
    Image.fromarray(rgb).save(path)

    out = loader.load_image(path, (64, 96), scale=0.5)
    # resized content occupies the top-left (24, 40); the rest is zero
    assert out.shape == (64, 96, 3)
    assert (out[24:, :, :] == 0).all()
    assert (out[:, 40:, :] == 0).all()
    pil = np.asarray(Image.fromarray(rgb).resize((40, 24), Image.BILINEAR),
                     np.float32)[:, :, ::-1]
    diff = np.abs(out[:24, :40] - pil)
    assert np.median(diff) < 8.0


def test_batch_threaded(loader, png_path, tmp_path):
    from PIL import Image

    rng = np.random.RandomState(1)
    paths, raws = [], []
    for i in range(6):
        arr = rng.randint(0, 255, (32 + i, 50, 3), dtype=np.uint8)
        p = str(tmp_path / f"b{i}.png")
        Image.fromarray(arr).save(p)
        paths.append(p)
        raws.append(arr)
    out = loader.load_batch(paths, (40, 50), [1.0] * 6)
    assert out.shape == (6, 40, 50, 3)
    for i, arr in enumerate(raws):
        h = arr.shape[0]
        np.testing.assert_array_equal(out[i, :h].astype(np.uint8),
                                      arr[:, :, ::-1])
        assert (out[i, h:] == 0).all()


def test_missing_file_raises(loader):
    with pytest.raises(IOError):
        loader.load_image("/nonexistent/nope.png", (32, 32), 1.0)
