"""Native runtime tests: PNG/PGM decode parity with cv2, prefetcher, timers."""

import os

import numpy as np
import cv2
import pytest

from orb_slam3_noted_tpu import native


@pytest.fixture(scope="module")
def png_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("imgs")
    rng = np.random.default_rng(0)
    paths = []
    for i in range(12):
        img = rng.integers(0, 255, size=(120, 160), dtype=np.uint8)
        p = os.path.join(d, f"f{i:03d}.png")
        cv2.imwrite(p, img)
        paths.append((p, img))
    return paths


class TestDecode:
    def test_png_gray_parity(self, png_dir):
        for p, img in png_dir[:3]:
            out = native.load_image_gray(p)
            np.testing.assert_array_equal(out, img)

    def test_png_rgb_to_gray(self, tmp_path):
        rng = np.random.default_rng(1)
        rgb = rng.integers(0, 255, size=(64, 80, 3), dtype=np.uint8)
        p = os.path.join(tmp_path, "c.png")
        cv2.imwrite(p, rgb)
        out = native.load_image_gray(p)
        # PNG stores RGB; our luma uses BT.601 like cv2 (integer rounding diff ok)
        ref = cv2.cvtColor(cv2.imread(p), cv2.COLOR_BGR2GRAY)
        assert np.abs(out.astype(int) - ref.astype(int)).max() <= 1

    def test_pgm(self, tmp_path):
        rng = np.random.default_rng(2)
        img = rng.integers(0, 255, size=(50, 70), dtype=np.uint8)
        p = os.path.join(tmp_path, "x.pgm")
        cv2.imwrite(p, img)
        out = native.load_image_gray(p)
        np.testing.assert_array_equal(out, img)


class TestPrefetcher:
    def test_ordered_prefetch(self, png_dir):
        paths = [p for p, _ in png_dir]
        loader = native.PrefetchingLoader(paths, 160, 120, n_buffers=4, n_threads=2)
        try:
            for i, (_, img) in enumerate(png_dir):
                out = loader.get(i)
                np.testing.assert_array_equal(out, img)
        finally:
            loader.close()


class TestTimers:
    def test_dump(self, tmp_path):
        t = native.StageTimer()
        import time

        t.start("extract")
        time.sleep(0.01)
        t.stop("extract")
        t.start("extract")
        time.sleep(0.002)
        t.stop("extract")
        path = os.path.join(tmp_path, "times.txt")
        t.dump(path)
        lines = open(path).read().strip().splitlines()
        row = [l for l in lines if l.startswith("extract")][0]
        name, mean, mx, count = row.split()
        assert int(count) == 2
        assert float(mx) >= float(mean) >= 1.0
