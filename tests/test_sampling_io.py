"""Tests for samplers (vs SciPy reference) and NIfTI round trip."""
import numpy as np
import pytest
from scipy import ndimage

import jax.numpy as jnp

from fetalreconstruction_tpu.ops.sampling import (
    sample_linear, sample_linear_padded, sample_nearest, resample_to_grid)
from fetalreconstruction_tpu.ops.gaussian import (
    gaussian_blur, gaussian_kernel1d, gaussian_blur_padded)
from fetalreconstruction_tpu.core.geometry import ImageAttributes
from fetalreconstruction_tpu.core.image import Image
from fetalreconstruction_tpu.io.nifti import (read_nifti, write_nifti,
                                              attr_to_affine, affine_to_attr)


def test_sample_linear_matches_scipy():
    rng = np.random.default_rng(0)
    vol = rng.normal(size=(10, 12, 14)).astype(np.float32)
    pts = rng.uniform(0.5, 8.5, size=(200, 3)).astype(np.float32)
    got = np.asarray(sample_linear(jnp.asarray(vol), jnp.asarray(pts)))
    # scipy map_coordinates wants (z, y, x) order
    want = ndimage.map_coordinates(vol, pts[:, ::-1].T, order=1)
    assert np.allclose(got, want, atol=1e-4)


def test_sample_linear_out_of_bounds_padding():
    vol = jnp.ones((4, 4, 4))
    pts = jnp.array([[-5.0, 0, 0], [0, 0, 10.0]])
    got = np.asarray(sample_linear(vol, pts, padding=-7.0))
    assert np.allclose(got, [-7.0, -7.0])


def test_sample_linear_padded_renormalizes():
    vol = np.full((4, 4, 4), -1.0, dtype=np.float32)
    vol[1, 1, 1] = 10.0
    vol[1, 1, 2] = 20.0
    # point midway between the two valid voxels along x: 6 padded corners -> pad
    got = np.asarray(sample_linear_padded(jnp.asarray(vol),
                                          jnp.array([[1.5, 1.0, 1.0]])))
    assert np.allclose(got, [-1.0])
    # point between them but weighted fully in-plane (only 2 corners padded
    # in the 2x2x2 cell starting at (1,1,1)? cell corners: x in {1,2}, y in
    # {1,2}, z in {1,2} -> 6 padded). Use a cell where <4 padded:
    vol2 = np.full((4, 4, 4), -1.0, dtype=np.float32)
    vol2[1, 1, 1] = 10.0; vol2[1, 1, 2] = 20.0
    vol2[1, 2, 1] = 30.0; vol2[1, 2, 2] = 40.0
    vol2[2, 1, 1] = 50.0
    # cell (x=1..2, y=1..2, z=1..2): padded corners = 3 -> renormalize
    got = np.asarray(sample_linear_padded(jnp.asarray(vol2),
                                          jnp.array([[1.5, 1.5, 1.25]])))
    w = {(0, 0, 0): .25 * .75, (1, 0, 0): .25 * .75,
         (0, 1, 0): .25 * .75, (1, 1, 0): .25 * .75,
         (0, 0, 1): .25 * .25}
    num = (w[(0, 0, 0)] * 10 + w[(1, 0, 0)] * 20 + w[(0, 1, 0)] * 30
           + w[(1, 1, 0)] * 40 + w[(0, 0, 1)] * 50)
    den = sum(w.values())
    assert np.allclose(got, [num / den], atol=1e-4)


def test_sample_nearest():
    vol = np.arange(27, dtype=np.float32).reshape(3, 3, 3)
    got = np.asarray(sample_nearest(jnp.asarray(vol),
                                    jnp.array([[1.4, 0.6, 2.2]])))
    # round -> (x=1, y=1, z=2): vol[2,1,1] = 2*9+1*3+1 = 22
    assert got[0] == 22.0


def test_resample_identity():
    rng = np.random.default_rng(3)
    a = ImageAttributes(x=14, y=12, z=10, dx=1.0, dy=1.0, dz=1.0)
    vol = rng.normal(size=a.shape_zyx).astype(np.float32)
    out = resample_to_grid(jnp.asarray(vol), jnp.asarray(a.w2i(), jnp.float32),
                           a.shape_zyx, jnp.asarray(a.i2w(), jnp.float32))
    assert np.allclose(np.asarray(out), vol, atol=1e-3)


def test_gaussian_kernel_radius():
    k = gaussian_kernel1d(1.0)
    assert len(k) == 9  # 2*round(4*1)+1
    assert np.isclose(k.sum(), 1.0, atol=1e-6)


def test_gaussian_blur_matches_scipy_interior():
    rng = np.random.default_rng(4)
    vol = rng.normal(size=(20, 20, 20)).astype(np.float32)
    got = np.asarray(gaussian_blur(jnp.asarray(vol), 2.0, (1.0, 1.0, 1.0)))
    want = ndimage.gaussian_filter(vol, sigma=2.0, truncate=4.0, mode="constant")
    # interior (away from boundary renormalization) should match closely
    assert np.allclose(got[8:12, 8:12, 8:12], want[8:12, 8:12, 8:12],
                       atol=2e-3)


def test_gaussian_blur_padded_keeps_padding():
    vol = np.full((8, 8, 8), -1.0, dtype=np.float32)
    vol[2:6, 2:6, 2:6] = 5.0
    out = np.asarray(gaussian_blur_padded(jnp.asarray(vol), 1.0,
                                          (1.0, 1.0, 1.0)))
    assert np.all(out[0] == -1.0)
    # constant region stays constant under renormalized blur
    assert np.allclose(out[3:5, 3:5, 3:5], 5.0, atol=1e-4)


def test_resample_bspline():
    """interp='bspline' (the PVR grey-stack resampler,
    irtkPatchBasedReconstruction.cpp:237-245): exact on the source grid,
    and closer than linear to a smooth function on a half-voxel grid."""
    n = 24
    z, y, x = np.meshgrid(*[np.linspace(0, 2 * np.pi, n)] * 3,
                          indexing="ij")
    f = lambda xx, yy, zz: np.sin(xx) * np.cos(yy) + 0.5 * np.sin(zz)
    vol = f(x, y, z).astype(np.float32)
    a = ImageAttributes(x=n, y=n, z=n, dx=1.0, dy=1.0, dz=1.0)
    same = resample_to_grid(vol, a.w2i(), a.shape_zyx, a.i2w(),
                            interp="bspline")
    assert np.allclose(np.asarray(same)[2:-2, 2:-2, 2:-2],
                       vol[2:-2, 2:-2, 2:-2], atol=1e-4)
    # half-voxel-shifted destination grid
    b = a.copy()
    b.xorigin += 0.5
    h = 2 * np.pi / (n - 1)
    want = f(x + 0.5 * h, y, z)
    got_bs = np.asarray(resample_to_grid(vol, a.w2i(), b.shape_zyx,
                                         b.i2w(), interp="bspline"))
    got_li = np.asarray(resample_to_grid(vol, a.w2i(), b.shape_zyx,
                                         b.i2w(), interp="linear"))
    c = np.s_[3:-3, 3:-3, 3:-3]
    err_bs = np.abs(got_bs[c] - want[c]).max()
    err_li = np.abs(got_li[c] - want[c]).max()
    assert err_bs < 0.5 * err_li, (err_bs, err_li)


def test_nifti_round_trip(tmp_path):
    rng = np.random.default_rng(5)
    a = ImageAttributes(x=16, y=12, z=8, dx=1.25, dy=1.25, dz=2.5)
    a.xorigin, a.yorigin, a.zorigin = 3.0, -7.0, 11.0
    th = np.deg2rad(20)
    a.xaxis = (np.cos(th), np.sin(th), 0.0)
    a.yaxis = (-np.sin(th), np.cos(th), 0.0)
    a.zaxis = (0.0, 0.0, 1.0)
    img = Image(rng.normal(size=a.shape_zyx).astype(np.float32), a)
    p = str(tmp_path / "t.nii.gz")
    write_nifti(img, p)
    back = read_nifti(p)
    assert np.allclose(back.data, img.data, atol=1e-5)
    assert np.allclose(back.attr.i2w(), a.i2w(), atol=1e-4)


def test_nifti_big_endian(tmp_path):
    """Big-endian files (old scanner exports) byte-swap on read, like
    niftilib's swap_nifti_header/nifti_image_read path."""
    rng = np.random.default_rng(7)
    a = ImageAttributes(x=10, y=9, z=4, dx=1.0, dy=1.5, dz=3.0)
    img = Image(rng.normal(size=a.shape_zyx).astype(np.float32) * 50, a)
    p_le = str(tmp_path / "le.nii")
    write_nifti(img, p_le)
    with open(p_le, "rb") as f:
        raw = bytearray(f.read())
    # byte-swap every header field we write plus the f32 voxel payload
    import struct as _s
    for off, n, sz in ((0, 1, 4), (40, 8, 2), (70, 1, 2), (72, 1, 2),
                       (76, 8, 4), (108, 1, 4), (112, 1, 4), (116, 1, 4),
                       (128, 1, 4), (252, 1, 2), (254, 1, 2), (256, 3, 4),
                       (268, 3, 4), (280, 12, 4), (344, 0, 0)):
        for k in range(n):
            s = off + k * sz
            raw[s:s + sz] = raw[s:s + sz][::-1]
    vox = np.frombuffer(bytes(raw[352:]), "<f4").astype(">f4")
    raw[352:] = vox.tobytes()
    p_be = str(tmp_path / "be.nii")
    with open(p_be, "wb") as f:
        f.write(bytes(raw))
    back = read_nifti(p_be)
    assert np.allclose(back.data, img.data, atol=1e-5)
    assert np.allclose(back.attr.i2w(), a.i2w(), atol=1e-4)


def test_affine_attr_round_trip():
    a = ImageAttributes(x=16, y=12, z=8, dx=1.25, dy=1.25, dz=2.5)
    a.xorigin, a.yorigin, a.zorigin = 3.0, -7.0, 11.0
    aff = attr_to_affine(a)
    a2 = affine_to_attr(aff, (a.x, a.y, a.z))
    assert np.allclose(a2.i2w(), a.i2w(), atol=1e-10)


def test_reference_mask_loads():
    """The bundled reference mask must load with sane geometry."""
    import os
    path = "/root/reference/data/mask_10_3T_brain_smooth.nii.gz"
    if not os.path.exists(path):
        pytest.skip("reference data not present")
    img = read_nifti(path)
    assert img.data.ndim == 3
    assert img.data.max() > 0
    sp = img.attr.spacing
    assert np.all(sp > 0.1) and np.all(sp < 10.0)
