import os
import tempfile

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")


def test_async_loader_order_and_content():
    from orbslam2_with_quadrics_tpu.native import AsyncImageLoader

    d = tempfile.mkdtemp()
    paths, refs = [], []
    rng = np.random.RandomState(0)
    for i in range(10):
        img = (rng.rand(64, 80, 3) * 255).astype(np.uint8)
        p = os.path.join(d, f"f{i}.png")
        cv2.imwrite(p, img)
        paths.append(p)
        refs.append(cv2.cvtColor(img, cv2.COLOR_BGR2GRAY).astype(np.float32))

    with AsyncImageLoader(paths, n_threads=3, capacity=4) as it:
        frames = [f for f, _ in it]

    assert len(frames) == 10
    for got, ref in zip(frames, refs):
        assert got.shape == ref.shape
        assert np.abs(got - ref).max() < 1.0  # rounding-only difference


def test_async_loader_depth16():
    from orbslam2_with_quadrics_tpu.native import AsyncImageLoader

    d = tempfile.mkdtemp()
    dep = (np.random.RandomState(1).rand(48, 64) * 60000).astype(np.uint16)
    p = os.path.join(d, "depth.png")
    cv2.imwrite(p, dep)
    with AsyncImageLoader([p]) as it:
        (gray, raw16), = list(it)
    assert raw16 is not None
    assert np.array_equal(raw16, dep)
    assert np.allclose(gray, dep.astype(np.float32))
