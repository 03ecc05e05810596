"""Tests for evaluation metrics, SLIC superpixels, and checkpointing."""
import numpy as np
import pytest

from fetalreconstruction_tpu.core.geometry import ImageAttributes
from fetalreconstruction_tpu.core.image import Image
from fetalreconstruction_tpu.evaluation.metrics import evaluate
from fetalreconstruction_tpu.patches.slic import (slic_labels,
                                                  extract_superpixel_patches)
from fetalreconstruction_tpu.pipeline.checkpoint import (save_checkpoint,
                                                         load_checkpoint)

from phantom import make_ground_truth


def _img(data, spacing=1.0):
    z, y, x = data.shape
    a = ImageAttributes(x=x, y=y, z=z, dx=spacing, dy=spacing, dz=spacing)
    return Image(np.asarray(data, np.float32), a)


def test_identical_images_metrics():
    rng = np.random.default_rng(0)
    img = _img(rng.uniform(0, 200, (12, 14, 16)))
    r = evaluate(img, img)
    assert r.cc > 0.999
    assert r.nmi > 1.9          # identical -> NMI ~ 2
    assert r.psnr > 60
    assert r.ssd < 1.0
    assert r.lc > 0.99 and r.ks > 0.99


def test_noise_lowers_metrics():
    rng = np.random.default_rng(1)
    a = rng.uniform(0, 200, (12, 14, 16))
    b = a + rng.normal(0, 20, a.shape)
    r = evaluate(_img(a), _img(b))
    assert 0.7 < r.cc < 0.999
    assert 1.0 < r.nmi < 1.6
    assert 15 < r.psnr < 35
    assert r.mi > 0.1


def test_contrast_invariance_of_nmi():
    rng = np.random.default_rng(2)
    a = rng.uniform(0, 200, (10, 10, 10))
    b = np.sqrt(a) * 14.0  # monotonic remap
    r = evaluate(_img(a), _img(b))
    assert r.nmi > 1.5          # high despite intensity remap
    assert r.mi > 0.5


def test_slic_labels_basic():
    rng = np.random.default_rng(3)
    img = np.zeros((48, 48), np.float32)
    img[:, :24] = 50.0
    img[:, 24:] = 150.0
    img += rng.normal(0, 2, img.shape).astype(np.float32)
    labels = slic_labels(img, compactness=10.0, num_superpixels=16)
    assert labels.min() >= 0
    n = labels.max() + 1
    assert 4 <= n <= 40
    # labels respect the intensity boundary: few superpixels straddle it
    straddle = 0
    for lab in range(n):
        m = labels == lab
        if m[:, :22].any() and m[:, 26:].any():
            straddle += 1
    assert straddle <= n // 4


def test_superpixel_patch_extraction():
    gt = make_ground_truth(n=24, spacing=2.0)
    st = Image(np.ascontiguousarray(gt.data[10:14]),
               gt.attr.region(0, 0, 10, gt.attr.x, gt.attr.y, 14))
    batch = extract_superpixel_patches([st], [4.0], spx_size=8,
                                       spx_extend=2, dilation_iters=2)
    assert batch.n_slices > 4
    # patch world geometry consistent with stack
    for k in range(0, batch.n_slices, 5):
        pa = batch.attrs[k]
        w = pa.image_to_world([1.0, 1.0, 0.0])
        p = st.attr.world_to_image(w)
        assert -1 <= p[2] <= st.attr.z, p


def test_checkpoint_round_trip(tmp_path):
    rng = np.random.default_rng(4)
    img = _img(rng.normal(50, 10, (8, 9, 10)), spacing=1.25)
    img.attr.xorigin = 3.0
    tr = rng.normal(size=(5, 4, 4))
    sw = rng.uniform(0, 1, 5).astype(np.float32)
    path = str(tmp_path / "ckpt.npz")
    save_checkpoint(path, 3, img, tr, slice_weights=sw,
                    stack_factors=np.asarray([1.5, 2.0], np.float32),
                    extra=dict(sigma2=np.float32(12.5)))
    back = load_checkpoint(path)
    assert back["iteration"] == 3
    assert np.allclose(back["recon"].data, img.data)
    assert np.allclose(back["recon"].attr.i2w(), img.attr.i2w())
    assert np.allclose(back["transforms"], tr)
    assert np.allclose(back["slice_weights"], sw)
    assert float(back["sigma2"]) == 12.5


def test_bspline_reconstruction_fits_smooth_field():
    from fetalreconstruction_tpu.sr.bspline import bspline_reconstruct
    rng = np.random.default_rng(5)
    shape = (16, 18, 20)
    zs, ys, xs = shape
    # smooth ground truth field
    z, y, x = np.meshgrid(np.arange(zs), np.arange(ys), np.arange(xs),
                          indexing="ij")
    gt = (30 + 20 * np.sin(x / 5.0) + 10 * np.cos(y / 4.0)
          + 5 * np.sin(z / 3.0)).astype(np.float32)
    # scattered samples
    m = 4000
    px = rng.uniform(0, xs - 1, m)
    py = rng.uniform(0, ys - 1, m)
    pz = rng.uniform(0, zs - 1, m)
    from scipy.ndimage import map_coordinates
    vals = map_coordinates(gt, np.stack([pz, py, px]), order=1)
    pts = np.stack([px, py, pz], -1)
    out = np.asarray(bspline_reconstruct(pts, vals, shape, levels=4))
    err = np.abs(out[2:-2, 2:-2, 2:-2] - gt[2:-2, 2:-2, 2:-2])
    assert err.mean() < 1.5, f"bspline fit error {err.mean()}"


def test_volume_wo_border_tool(tmp_path, monkeypatch):
    """The measureVolWOBorder.cc analog: border-zeroed copies + ml rows."""
    from fetalreconstruction_tpu.cli.evaluate_main import volume_wo_border
    from fetalreconstruction_tpu.io.nifti import write_nifti, read_nifti

    gt = make_ground_truth(n=16, spacing=2.0)
    src = tmp_path / "in"
    src.mkdir()
    write_nifti(gt, str(src / "vol1.nii.gz"))
    monkeypatch.chdir(tmp_path)
    rows = volume_wo_border(str(src))
    assert len(rows) == 1
    name, ml = rows[0]
    # nonzero voxels of the 3-voxel-cropped interior, in ml
    core = np.zeros_like(gt.data)
    core[3:-3, 3:-3, 3:-3] = gt.data[3:-3, 3:-3, 3:-3]
    want = int(np.count_nonzero(core) * 8.0) // 1000
    assert ml == want
    out = read_nifti(str(tmp_path / "c_vol1.nii.gz"))
    assert np.count_nonzero(out.data[:3]) == 0
    assert (tmp_path / "volumeMeasures.txt").read_text().strip() \
        == f"{name} {ml}"


def test_evaluate_border_flag(tmp_path):
    """--border N crops the target border before the metric battery."""
    from fetalreconstruction_tpu.cli.evaluate_main import main as eval_main
    from fetalreconstruction_tpu.io.nifti import write_nifti
    import json, contextlib, io

    gt = make_ground_truth(n=16, spacing=2.0)
    noisy = Image(gt.data + np.random.default_rng(0).normal(
        0, 5, gt.data.shape).astype(np.float32), gt.attr.copy())
    t, s = str(tmp_path / "t.nii"), str(tmp_path / "s.nii")
    write_nifti(gt, t)
    write_nifti(noisy, s)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        assert eval_main([t, s, "--json", "--border", "3"]) == 0
    r = json.loads(buf.getvalue())
    assert r["psnr"] > 10.0 and 0.9 < r["cc"] <= 1.0


@pytest.mark.slow
def test_recon_eval_harness(tmp_path, monkeypatch):
    """irtkReconstructionEvaluation.cc analog end-to-end: crop + rigid
    refine + metric battery, writing all four artifacts."""
    from fetalreconstruction_tpu.cli.recon_eval_main import main as re_main
    from fetalreconstruction_tpu.io.nifti import write_nifti, read_nifti
    from fetalreconstruction_tpu.io.dof import read_dof
    import contextlib, io

    gt = make_ground_truth(n=24, spacing=2.0)
    # "reconstruction" = slightly shifted, noisy copy of gt
    from fetalreconstruction_tpu.ops.sampling import resample_to_grid
    from fetalreconstruction_tpu.core.geometry import rigid_matrix
    import jax.numpy as jnp
    t_true = rigid_matrix([1.0, -0.5, 0.5, 0, 0, 0])
    moved = np.asarray(resample_to_grid(
        jnp.asarray(gt.data), jnp.asarray(gt.attr.w2i() @ t_true,
                                          jnp.float32),
        gt.attr.shape_zyx, jnp.asarray(gt.attr.i2w(), jnp.float32),
        interp="linear", padding=0.0))
    src = Image(moved.astype(np.float32), gt.attr.copy())
    monkeypatch.chdir(tmp_path)
    write_nifti(gt, "t.nii")
    write_nifti(src, "s.nii")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        rc = re_main(["t.nii", "s.nii", "out.nii", "diff.nii",
                      "mask.nii", "ref.dof.gz"])
    assert rc == 0
    assert "PSNR:" in buf.getvalue()
    out = read_nifti("out.nii")
    assert out.data.shape == gt.data.shape
    d = read_dof("ref.dof.gz")
    assert d.shape == (4, 4)
    mask = read_nifti("mask.nii")
    assert np.array_equal(np.unique(mask.data), [0.0, 1.0])
