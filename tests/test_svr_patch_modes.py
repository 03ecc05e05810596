"""SVR tool's experimental patch/superpixel slice modes + --manualMask.

Covers reconstruction.cc:733-747 (CreateSlicesAndTransformations
{PatchBased,SuperpixelBased}) and 1240-1249 (manual mask through PSF)
driven through the same run_svr orchestrator.
"""
import numpy as np
import pytest

from fetalreconstruction_tpu.core.image import Image
from fetalreconstruction_tpu.pipeline.config import SVRConfig
from fetalreconstruction_tpu.pipeline.svr import run_svr

from phantom import make_ground_truth, simulate_stacks

# run_svr-driven end-to-end modes: heavy on CPU -> explicit `-m slow`
pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def data():
    gt = make_ground_truth(n=28, spacing=1.5)
    stacks, _ = simulate_stacks(gt, n_stacks=2, in_plane=2.0, dz=3.0,
                                noise=1.0)
    mask_img = Image((gt.data > 1.0).astype(np.float32), gt.attr.copy())
    return gt, stacks, mask_img


def _cfg(**kw):
    base = dict(iterations=1, resolution=1.8, rec_iterations_first=2,
                rec_iterations_last=2, smooth_mask=2.0,
                multires_levels=1, reg_levels=1, reg_iterations=3)
    base.update(kw)
    return SVRConfig(**base)


def test_patch_based_mode(data):
    gt, stacks, mask_img = data
    res = run_svr(_cfg(patch_based=True, patch_size=12, patch_stride=8),
                  stacks=stacks, mask=mask_img)
    out = res.reconstructed
    assert np.all(np.isfinite(out.data))
    assert (out.data > 0).sum() > 100
    # patch mode yields more batch entries than whole slices
    n_whole = sum(s.attr.z for s in stacks)
    assert res.transforms.shape[0] > n_whole


def test_superpixel_based_mode(data):
    gt, stacks, mask_img = data
    res = run_svr(_cfg(superpixel_based=True, num_superpixels=6),
                  stacks=stacks, mask=mask_img)
    out = res.reconstructed
    assert np.all(np.isfinite(out.data))
    assert (out.data > 0).sum() > 100


def test_manual_mask_transform(data, tmp_path):
    gt, stacks, mask_img = data
    # manual mask fits the FIRST stack: ellipsoid interior per slice
    manual = Image((stacks[0].data > 20.0).astype(np.float32),
                   stacks[0].attr.copy())
    from fetalreconstruction_tpu.io.nifti import write_nifti
    mpath = str(tmp_path / "manual.nii.gz")
    write_nifti(manual, mpath)
    res = run_svr(_cfg(manual_mask=mpath), stacks=stacks, mask=mask_img)
    mv = res.manual_mask_volume
    assert mv is not None
    assert mv.data.shape == res.reconstructed.data.shape
    vals = np.unique(mv.data)
    assert set(vals.tolist()) <= {0.0, 1.0}
    # the transformed mask overlaps the reconstructed object
    inside = mv.data > 0
    assert inside.sum() > 50
    assert res.reconstructed.data[inside].mean() > \
        res.reconstructed.data[~inside].mean()
