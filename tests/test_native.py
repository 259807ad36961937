"""Native C++ dataplane tests (skipped when the toolchain is absent)."""

import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")
native = pytest.importorskip("egot2x.native")

pytestmark = pytest.mark.skipif(not native.AVAILABLE,
                                reason="native dataplane not built")


def test_decode_crop_resize_matches_cv2(tmp_path, rng):
    paths, bboxes, refs = [], [], []
    for i in range(8):
        img = rng.integers(0, 255, (100, 140, 3), dtype=np.uint8)
        p = str(tmp_path / f"f{i}.jpg")
        cv2.imwrite(p, cv2.cvtColor(img, cv2.COLOR_RGB2BGR),
                    [cv2.IMWRITE_JPEG_QUALITY, 95])
        paths.append(p)
        bboxes.append([8.0, 6.0, 120.0, 90.0])
        dec = cv2.cvtColor(cv2.imread(p), cv2.COLOR_BGR2RGB)
        refs.append(cv2.resize(dec[6:90, 8:120], (48, 48)))
    out = native.decode_crop_resize(paths, np.asarray(bboxes, np.float32), 48)
    diff = np.abs(out.astype(int) - np.stack(refs).astype(int))
    assert diff.max() <= 2  # bilinear rounding differences only


def test_decode_missing_file_zero_frame(tmp_path):
    out = native.decode_crop_resize([str(tmp_path / "missing.jpg")],
                                    np.asarray([[0, 0, 10, 10]], np.float32), 32)
    assert (out == 0).all()


def test_normalize_matches_numpy(rng):
    u8 = rng.integers(0, 255, (4, 16, 16, 3), dtype=np.uint8)
    mean = np.array([0.485, 0.456, 0.406])
    std = np.array([0.229, 0.224, 0.225])
    a = native.normalize(u8, mean, std)
    b = (u8.astype(np.float32) / 255.0 - mean.astype(np.float32)) / std.astype(np.float32)
    np.testing.assert_allclose(a, b, atol=1e-5)


def test_lam_loader_native_path(tmp_path, rng):
    from egot2x.data.lam import LamClipDataset
    from egot2x.data.synthetic import make_lam_fixture

    root = make_lam_fixture(str(tmp_path / "lam"), img_size=32)
    ds = LamClipDataset(root, split="train", stride=1, img_size=32)
    item = ds[1]  # interior keyframe: full native window
    assert item["frames"].shape == (7, 32, 32, 3)
    assert np.isfinite(item["frames"]).all()


def test_pnr_loader_native_matches_python(tmp_path):
    """PNR frame loading: the batched C++ decode path must produce the
    same uint8 frames as the per-frame cv2 path (full-frame resize)."""
    from egot2x import native
    from egot2x.data.pnr import PnrClipDataset
    from egot2x.data.synthetic import make_pnr_fixture

    root = make_pnr_fixture(str(tmp_path / "pnr"), img_size=32)
    ds = PnrClipDataset(root, split="train", crop_size=32)
    item = ds[0]
    assert item["frames"].dtype == np.uint8
    assert item["frames"].shape[1:] == (32, 32, 3)
    if native.AVAILABLE:
        # force the python path and compare
        avail, native.AVAILABLE = native.AVAILABLE, False
        try:
            item_py = ds[0]
        finally:
            native.AVAILABLE = avail
        np.testing.assert_allclose(
            item["frames"].astype(np.int16),
            item_py["frames"].astype(np.int16), atol=1)
