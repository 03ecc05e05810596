"""Native C++ tier: SLIC kernel + NIfTI codec vs the Python oracles."""
import os

import numpy as np
import pytest

from fetalreconstruction_tpu import native
from fetalreconstruction_tpu.io import nifti1
from fetalreconstruction_tpu.patches import slic as slic_mod

pytestmark = pytest.mark.skipif(native.get_lib() is None,
                                reason="native tier unavailable")


def _python_slic(img, num_superpixels, compactness=10.0, iterations=5):
    """Run the NumPy fallback by disabling the native dispatch."""
    os.environ["FETALRECON_NO_NATIVE"] = "1"
    saved_lib, saved_tried = native._LIB, native._TRIED
    native._LIB, native._TRIED = None, True
    try:
        return slic_mod.slic_labels(img, compactness=compactness,
                                    num_superpixels=num_superpixels,
                                    iterations=iterations)
    finally:
        native._LIB, native._TRIED = saved_lib, saved_tried
        del os.environ["FETALRECON_NO_NATIVE"]


def _make_image(h=96, w=80, seed=0):
    rng = np.random.default_rng(seed)
    yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    img = (200.0 * np.exp(-(((yy - h / 2) / (h / 3)) ** 2
                            + ((xx - w / 2) / (w / 3)) ** 2))
           + 30.0 * rng.standard_normal((h, w)))
    img[img < 0] = 0
    return img.astype(np.float32)


def test_slic_native_matches_python_oracle():
    img = _make_image()
    nat = native.slic_segment(img, 24)
    ref = _python_slic(img, 24)
    assert nat is not None
    assert nat.shape == ref.shape
    # same algorithm, double precision on both sides: near-total agreement
    # (ties at window borders may fall either way)
    agree = float((nat == ref).mean())
    assert agree > 0.97, f"agreement {agree}"
    # full coverage, labels dense in [0, max]
    assert nat.min() == 0
    assert len(np.unique(nat)) == nat.max() + 1


def test_slic_batch_matches_single():
    imgs = np.stack([_make_image(seed=s) for s in range(3)])
    res = native.slic_segment_batch(imgs, 16, nthreads=2)
    assert res is not None
    labels, counts = res
    for i in range(3):
        single = native.slic_segment(imgs[i], 16)
        np.testing.assert_array_equal(labels[i], single)
        assert counts[i] == single.max() + 1


def test_nifti_native_roundtrip(tmp_path):
    rng = np.random.default_rng(1)
    data = rng.uniform(0, 500, (17, 13, 9)).astype(np.float32)
    affine = np.eye(4)
    affine[:3, 3] = [4.0, -2.0, 7.5]
    for name in ("vol.nii", "vol.nii.gz"):
        p = str(tmp_path / name)
        nifti1.save(p, data, affine)  # native write path when available
        d2, a2, _ = nifti1.load(p)    # native read path
        np.testing.assert_allclose(d2, data, rtol=0, atol=0)
        np.testing.assert_allclose(a2, affine, atol=1e-5)
        # python (gzip module) reader agrees with the native codec
        import gzip
        opener = gzip.open if name.endswith(".gz") else open
        with opener(p, "rb") as f:
            raw = f.read()
        d3, a3, _ = nifti1.load_bytes(raw)
        np.testing.assert_array_equal(np.asarray(d3), np.asarray(d2))


def test_read_bytes_many_threads(tmp_path):
    rng = np.random.default_rng(2)
    paths = []
    blobs = []
    for i in range(6):
        p = str(tmp_path / f"f{i}.nii.gz")
        data = rng.uniform(0, 100, (8, 8, 4)).astype(np.float32)
        nifti1.save(p, data, np.eye(4))
        paths.append(p)
        blobs.append(native.read_bytes(p))
    out = native.read_bytes_many(paths, nthreads=3)
    assert out is not None
    for got, want in zip(out, blobs):
        assert got == want
    # missing file -> None entry, others unaffected
    out2 = native.read_bytes_many(paths + [str(tmp_path / "missing.nii")])
    assert out2[-1] is None and out2[0] == blobs[0]


def test_read_stacks_threaded(tmp_path):
    from fetalreconstruction_tpu.io import nifti as nio
    rng = np.random.default_rng(3)
    paths = []
    for i in range(3):
        img_data = rng.uniform(0, 300, (10, 12, 6)).astype(np.float32)
        p = str(tmp_path / f"s{i}.nii.gz")
        nifti1.save(p, img_data, np.eye(4))
        paths.append(p)
    stacks = nio.read_stacks(paths)
    singles = [nio.read_nifti(p) for p in paths]
    for a, b in zip(stacks, singles):
        np.testing.assert_array_equal(a.data, b.data)
        np.testing.assert_allclose(a.attr.i2w(), b.attr.i2w())
