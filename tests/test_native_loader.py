"""Native prefetching loader vs cv2 reference decode."""

import os

import numpy as np
import pytest

from eao_slam_tpu.io.native_loader import SequenceLoader, native_available


@pytest.fixture(scope="module")
def png_sequence(tmp_path_factory, ):
    import cv2

    rng = np.random.default_rng(0)
    d = tmp_path_factory.mktemp("seq")
    files, stamps = [], []
    for i in range(6):
        img = rng.integers(0, 256, (120, 160), dtype=np.uint8)
        name = f"{i:04d}.png"
        cv2.imwrite(str(d / name), img)
        files.append(name)
        stamps.append(1000.0 + i / 30.0)
    return str(d), files, stamps


@pytest.mark.skipif(not native_available(), reason="native lib not built")
def test_native_matches_cv2(png_sequence):
    import cv2

    d, files, stamps = png_sequence
    got = {}
    with SequenceLoader(d, files, stamps, 160, 120, n_threads=3, ring=4) as ld:
        for idx, t, img in ld:
            got[idx] = (t, img)
    assert len(got) == 6
    for i, name in enumerate(files):
        ref = cv2.imread(os.path.join(d, name), cv2.IMREAD_GRAYSCALE)
        t, img = got[i]
        assert abs(t - stamps[i]) < 1e-9
        np.testing.assert_array_equal(img.astype(np.uint8), ref)


@pytest.mark.skipif(not native_available(), reason="native lib not built")
def test_native_in_order_with_many_threads(png_sequence):
    d, files, stamps = png_sequence
    order = []
    with SequenceLoader(d, files, stamps, 160, 120, n_threads=4, ring=2) as ld:
        for idx, t, img in ld:
            order.append(idx)
    assert order == list(range(6))


def test_fallback_path(png_sequence):
    d, files, stamps = png_sequence
    with SequenceLoader(d, files, stamps, 160, 120, force_fallback=True) as ld:
        frames = list(ld)
    assert len(frames) == 6


@pytest.mark.skipif(not native_available(), reason="native lib not built")
def test_unreadable_file_skipped(png_sequence, tmp_path):
    d, files, stamps = png_sequence
    bad = files + ["missing.png"]
    bstamps = stamps + [2000.0]
    with SequenceLoader(d, bad, bstamps, 160, 120) as ld:
        idxs = [i for i, _, _ in ld]
    assert idxs == list(range(6))
