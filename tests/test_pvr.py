"""PVR patch extraction + patch-based reconstruction tests."""
import numpy as np
import pytest

from fetalreconstruction_tpu.core.geometry import ImageAttributes
from fetalreconstruction_tpu.core.image import Image
from fetalreconstruction_tpu.patches.extract import extract_patches
from fetalreconstruction_tpu.pipeline.pvr import PVRConfig, run_pvr

from phantom import make_ground_truth, simulate_stacks, psnr


def test_patch_geometry():
    a = ImageAttributes(x=20, y=16, z=3, dx=1.5, dy=1.5, dz=3.0)
    a.xorigin, a.yorigin, a.zorigin = 5.0, -2.0, 1.0
    rng = np.random.default_rng(0)
    st = Image(rng.uniform(10, 50, a.shape_zyx).astype(np.float32), a)
    batch = extract_patches([st], [6.0], patch_size=8, stride=4)
    assert batch.n_slices > 3 * 2  # several patches per slice
    # every patch pixel must carry the world position of its stack pixel
    for k in range(0, batch.n_slices, 7):
        pa = batch.attrs[k]
        w_p = pa.image_to_world([2.0, 3.0, 0.0])
        # locate the same world point in the stack
        p_s = a.world_to_image(w_p)
        assert abs(p_s[2] - round(p_s[2])) < 1e-6
        x, y, z = int(round(p_s[0])), int(round(p_s[1])), int(round(p_s[2]))
        if 0 <= x < a.x and 0 <= y < a.y:
            assert batch.data[k, 3, 2] == st.data[z, y, x]
    # thickness propagated
    assert np.allclose(batch.dims[:, 2], 6.0)


def test_patch_fill_threshold():
    a = ImageAttributes(x=16, y=16, z=1, dx=1.0, dy=1.0, dz=2.0)
    data = np.zeros(a.shape_zyx, np.float32)
    data[0, :6, :6] = 50.0  # corner block: 36 px > 1/3 * 64
    st = Image(data, a)
    batch = extract_patches([st], [4.0], patch_size=8, stride=8)
    # only the corner patch clears the 1/3 fill threshold
    assert batch.n_slices == 1


def test_full_slices_mode():
    a = ImageAttributes(x=12, y=10, z=4, dx=1.0, dy=1.0, dz=2.0)
    rng = np.random.default_rng(1)
    st = Image(rng.uniform(10, 50, a.shape_zyx).astype(np.float32), a)
    batch = extract_patches([st], [4.0], patch_size=6, stride=3,
                            use_full_slices=True)
    assert batch.n_slices == 4
    assert batch.data.shape[1:] == (10, 12)


@pytest.mark.slow
def test_pvr_end_to_end():
    gt = make_ground_truth(n=28, spacing=1.8)
    stacks, _ = simulate_stacks(gt, n_stacks=2, in_plane=2.2, dz=3.6,
                                noise=1.0)
    mask = Image((gt.data > 1.0).astype(np.float32), gt.attr.copy())
    cfg = PVRConfig(iterations=2, resolution=1.8, rec_iterations_first=3,
                    rec_iterations_last=4, smooth_mask=2.0,
                    multires_levels=2, reg_levels=1, reg_iterations=4,
                    patch_size=10, patch_stride=5, engine="exact")
    res = run_pvr(cfg, stacks=stacks, mask=mask)
    out = res.reconstructed
    assert np.all(np.isfinite(out.data))
    import jax.numpy as jnp
    from fetalreconstruction_tpu.ops.sampling import resample_to_grid
    g = np.asarray(resample_to_grid(
        jnp.asarray(gt.data), jnp.asarray(gt.attr.w2i(), jnp.float32),
        out.attr.shape_zyx, jnp.asarray(out.attr.i2w(), jnp.float32)))
    roi = (g > 1.0) & (out.data > 0)
    assert roi.mean() > 0.05
    p = psnr(out.data[roi], g[roi])
    assert p > 13.0, f"PVR PSNR {p}"
    # many more patches than slices
    assert res.transforms.shape[0] > sum(s.attr.z for s in stacks)


@pytest.mark.slow
def test_pvr_evaluate_gt_csv(tmp_path, monkeypatch):
    """--evaluateGt wiring: the iteration hook must survive the pipeline's
    3-arg call (it, recon, transforms) and append one CSV row per outer
    iteration (EvaluateGt3d, irtkPatchBasedReconstruction.cpp:570-580)."""
    import os
    monkeypatch.chdir(tmp_path)
    gt = make_ground_truth(n=24, spacing=1.8)
    stacks, _ = simulate_stacks(gt, n_stacks=2, in_plane=2.2, dz=3.6)
    mask = Image((gt.data > 1.0).astype(np.float32), gt.attr.copy())
    from fetalreconstruction_tpu.io.nifti import write_nifti
    gt_path = str(tmp_path / "gt.nii.gz")
    write_nifti(gt, gt_path)
    cfg = PVRConfig(iterations=2, resolution=1.8, rec_iterations_first=2,
                    rec_iterations_last=2, smooth_mask=2.0,
                    multires_levels=1, reg_levels=1, reg_iterations=2,
                    patch_size=10, patch_stride=5, engine="exact",
                    evaluate_gt=gt_path, no_log=True)
    run_pvr(cfg, stacks=stacks, mask=mask)
    csv = tmp_path / "log-evaluate-Gt.csv"
    assert csv.exists(), "evaluateGt must produce log-evaluate-Gt.csv"
    lines = [l for l in csv.read_text().splitlines() if l.strip()]
    # header + one row per outer iteration
    assert len(lines) == 1 + cfg.iterations, lines
    assert "iter-0" in lines[1] and "iter-1" in lines[2]


def test_pvr_evaluate_2d_csv(tmp_path, monkeypatch):
    """--evaluate_2d wiring: per-PATCH CSVs (Evaluate2d /
    EvaluateBaseline2d, irtkPatchBasedReconstruction.cpp:1011-1449) with
    the 18-metric header and one row per surviving patch."""
    import os
    monkeypatch.chdir(tmp_path)
    gt = make_ground_truth(n=24, spacing=1.8)
    stacks, _ = simulate_stacks(gt, n_stacks=2, in_plane=2.2, dz=3.6)
    mask = Image((gt.data > 1.0).astype(np.float32), gt.attr.copy())
    from fetalreconstruction_tpu.io.nifti import write_nifti
    em_path = str(tmp_path / "evalmask.nii.gz")
    write_nifti(mask, em_path)
    cfg = PVRConfig(iterations=1, resolution=1.8, rec_iterations_first=2,
                    rec_iterations_last=2, smooth_mask=2.0,
                    multires_levels=1, reg_levels=1, reg_iterations=2,
                    patch_size=10, patch_stride=5, engine="exact",
                    evaluation_masks=[em_path], evaluate_2d=True,
                    evaluate_baseline=True, no_log=True)
    run_pvr(cfg, stacks=stacks, mask=mask)
    files = os.listdir(tmp_path)
    it_csvs = [f for f in files
               if f.startswith("log-evaluate-stack-") and
               "-iteration-0-" in f]
    base_csvs = [f for f in files if "-baseline-size-" in f]
    assert len(it_csvs) == 2, files   # one per stack
    assert len(base_csvs) == 1, files
    for f in it_csvs + base_csvs:
        lines = [l for l in (tmp_path / f).read_text().splitlines()
                 if l.strip()]
        assert lines[0].count(",") >= 18, lines[0]
        assert "PSNR" in lines[0] and "KappaStatistic" in lines[0]
        assert len(lines) > 1, f  # at least one patch row
        # every data row: patch no + 17 numeric fields
        row = lines[1].rstrip(",").split(",")
        assert len(row) == 18, row
        float(row[1])
