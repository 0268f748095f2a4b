"""Native host-ops library: build, parity with numpy paths, threading."""
import numpy as np
import pytest

from uaps_tpu import native
from uaps_tpu.data.augment import normalize
from uaps_tpu.utils.rle import mask2rle

pytestmark = pytest.mark.fast


@pytest.fixture(scope="module")
def L():
    lib = native.lib()
    if lib is None:
        pytest.skip("native toolchain unavailable")
    return lib


class TestBuild:
    def test_version(self, L):
        assert L.uaps_version() == 1


class TestNormalize:
    def test_matches_numpy(self, L, rng):
        src = rng.integers(0, 256, (4, 33, 41, 3), np.uint8)
        mean, std = (0.485, 0.456, 0.406), (0.229, 0.224, 0.225)
        ours = native.normalize_batch(src, mean, std)
        ref = np.stack([normalize(s, mean, std) for s in src])
        np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)

    def test_grayscale(self, L, rng):
        src = rng.integers(0, 256, (2, 16, 16, 1), np.uint8)
        ours = native.normalize_batch(src, (0.5314,), (0.1357,))
        ref = np.stack([normalize(s, (0.5314,), (0.1357,)) for s in src])
        np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)


class TestTransform:
    def _run(self, L, src, flags, dh, dw, mean, std):
        n, sh, sw, c = src.shape
        dst = np.empty((n, dh, dw, c), np.float32)
        L.uaps_transform_batch(np.ascontiguousarray(src), dst, n, sh, sw, c,
                               dh, dw, np.asarray(flags, np.int32),
                               np.asarray(mean, np.float32),
                               np.asarray(std, np.float32))
        return dst

    def test_identity_resize_normalize(self, L, rng):
        src = rng.integers(0, 256, (2, 20, 30, 3), np.uint8)
        out = self._run(L, src, [0, 0], 10, 15, (0.5,) * 3, (0.25,) * 3)
        # nearest: floor(i * s/d) sampling
        import cv2
        for i in range(2):
            ref = cv2.resize(src[i], (15, 10),
                             interpolation=cv2.INTER_NEAREST)
            ref = (ref.astype(np.float32) / 255.0 - 0.5) / 0.25
            np.testing.assert_allclose(out[i], ref, rtol=1e-5, atol=1e-5)

    def test_flips_and_rot(self, L, rng):
        src = rng.integers(0, 256, (1, 8, 8, 1), np.uint8)
        base = self._run(L, src, [0], 8, 8, (0.0,), (1.0,))
        hf = self._run(L, src, [1], 8, 8, (0.0,), (1.0,))
        np.testing.assert_allclose(hf[0], base[0][:, ::-1], atol=1e-6)
        vf = self._run(L, src, [2], 8, 8, (0.0,), (1.0,))
        np.testing.assert_allclose(vf[0], base[0][::-1], atol=1e-6)
        r1 = self._run(L, src, [1 << 2], 8, 8, (0.0,), (1.0,))
        np.testing.assert_allclose(r1[0], np.rot90(base[0]), atol=1e-6)
        r3 = self._run(L, src, [3 << 2], 8, 8, (0.0,), (1.0,))
        np.testing.assert_allclose(r3[0], np.rot90(base[0], 3), atol=1e-6)

    def test_mask_transform_binarize(self, L, rng):
        src = rng.choice([0, 255], (1, 8, 8)).astype(np.uint8)
        dst = np.empty((1, 8, 8), np.int32)
        L.uaps_transform_mask(np.ascontiguousarray(src), dst, 1, 8, 8, 8, 8,
                              np.asarray([0], np.int32), 1)
        np.testing.assert_array_equal(dst[0], (src[0] > 127).astype(np.int32))


class TestRLE:
    def test_matches_python(self, L, rng):
        mask = (rng.random((17, 23)) > 0.5).astype(np.uint8)
        assert native.rle_encode(mask) == mask2rle(mask.astype(np.float32))

    def test_empty_and_full(self, L):
        assert native.rle_encode(np.zeros((4, 4), np.uint8)) == ""
        assert native.rle_encode(np.ones((2, 2), np.uint8)) == "1 4"
