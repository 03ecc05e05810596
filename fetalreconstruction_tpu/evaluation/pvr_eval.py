"""PVR research-evaluation harness: per-iteration CSV metric rows.

Reimplements the reference PVR evaluation battery
(irtkPatchBasedReconstruction.cpp:1010-2381, flags at
patchBasedReconMain.cpp:137-144):

- EvaluateGt3d (cpp:2153-2381): reconstruction vs a ground-truth volume —
  MSE/PSNR, windowed SSIM/DSSIM (+ dssim image dump), and the full
  joint-histogram battery, appended per iteration to log-evaluate-Gt.csv;
- Evaluate3d (cpp:1767-2151): reconstruction vs each input stack inside a
  dilated (3x, 26-conn) evaluation mask -> log-evaluate-<mask>.csv;
- EvaluateBaseline3d (cpp:1451-1766): the same battery for the raw input
  stacks (the no-reconstruction baseline) vs ground truth;
- --patchExtraction (cpp via m_patch_extraction): dump the extracted patch
  batch to disk for offline analysis.

The histogram metrics come from evaluation.metrics.evaluate (the
irtkEvaluation/irtkHistogram_2D equivalent); SSIM uses a 3^3 uniform
window like the reference's local-moment loops.
"""
from __future__ import annotations

import os
from typing import List, Optional

import numpy as np

from ..core.image import Image
from ..ops.morphology import dilate
from ..ops.sampling import resample_to_grid
from .metrics import evaluate

CSV_HEADER = ("MSE,PSNR,SSIM,DSSIM,PatchMean,ReconMean,PatchVariance,"
              "ReconVariance,Covariance,JointEntropy,Crosscorrelation,"
              "CorrelationRatioPatchRecon,CorrelationRatioReconPatch,"
              "MutualInformation,NormalizedMutualInformation,"
              "SumSquareDiff,LabelConsistency,KappaStatistic")


def _uniform3(vol: np.ndarray) -> np.ndarray:
    """3x3x3 box mean with edge replication (SSIM local moments)."""
    out = vol.astype(np.float64)
    for ax in range(3):
        p = np.concatenate([out.take([0], ax), out,
                            out.take([-1], ax)], axis=ax)
        out = (np.add.reduce([p.take(range(i, i + out.shape[ax]), ax)
                              for i in range(3)])) / 3.0
    return out


def ssim_dssim(ref: np.ndarray, tar: np.ndarray, valid: np.ndarray):
    """Windowed SSIM over valid voxels (EvaluateGt3d, cpp:2290-2304:
    C1=6.5025, C2=58.5225 constants of the 255-range convention).

    Returns (ssim_mean, dssim_mean, dssim_image)."""
    C1, C2 = 6.5025, 58.5225
    mu1 = _uniform3(ref)
    mu2 = _uniform3(tar)
    var1 = _uniform3(ref * ref) - mu1 ** 2
    var2 = _uniform3(tar * tar) - mu2 ** 2
    covar = _uniform3(ref * tar) - mu1 * mu2
    ssim = ((2 * mu1 * mu2 + C1) * (2 * covar + C2)) / (
        (mu1 ** 2 + mu2 ** 2 + C1) * (var1 + var2 + C2))
    dssim = (1.0 - ssim) / 2.0
    n = max(int(valid.sum()), 1)
    return (float(ssim[valid].sum() / n), float(dssim[valid].sum() / n),
            np.where(valid, dssim, 0.0).astype(np.float32))


def _csv_row(path: str, tag: str, write_header: bool, mse, psnr, ssim,
             dssim, ev, header_tag: Optional[str] = None) -> None:
    # Reference header row carries the bare config tag (cpp:2327), while
    # data rows are prefixed "iter-N-..." (cpp:2349).
    new = write_header or not os.path.exists(path)
    with open(path, "a") as f:
        if new:
            f.write((header_tag if header_tag is not None else tag)
                    + "," + CSV_HEADER + ",\n")
        f.write(",".join([tag] + ["%g" % v for v in [
            mse, psnr, ssim, dssim, ev.mean_x, ev.mean_y, ev.var_x,
            ev.var_y, ev.cov, ev.je, ev.cc, ev.cr_xy, ev.cr_yx, ev.mi,
            ev.nmi, ev.ssd, ev.lc, ev.ks]]) + ",\n")


def _resample_like(img: Image, ref: Image) -> np.ndarray:
    import jax.numpy as jnp
    out = resample_to_grid(jnp.asarray(img.data, jnp.float32),
                           jnp.asarray(img.attr.w2i(), jnp.float32),
                           ref.attr.shape_zyx,
                           jnp.asarray(ref.attr.i2w(), jnp.float32),
                           interp="linear", padding=0.0)
    return np.asarray(out, np.float64)


def evaluate_gt_3d(iteration: int, recon: Image, gt: Image,
                   max_intensity: float, tag: str,
                   csv_path: str = "log-evaluate-Gt.csv",
                   dssim_path: Optional[str] = None) -> dict:
    """EvaluateGt3d (cpp:2153-2381): metrics over GT voxels > 0."""
    ref = np.asarray(gt.data, np.float64)
    tar = _resample_like(recon, gt)
    valid = ref > 0
    n = max(int(valid.sum()), 1)
    mse = float(((ref - tar)[valid] ** 2).sum() / n)
    psnr = 20 * np.log10(max(max_intensity, 1e-30)) \
        - 10 * np.log10(max(mse, 1e-30))
    ssim, dssim, dimg = ssim_dssim(ref, tar, valid)
    ev = evaluate(gt, recon)
    _csv_row(csv_path, f"iter-{iteration}-{tag}", iteration == 0,
             mse, psnr, ssim, dssim, ev, header_tag=tag)
    if dssim_path:
        from ..io.nifti import write_nifti
        write_nifti(Image(dimg, gt.attr.copy()), dssim_path)
    return dict(mse=mse, psnr=psnr, ssim=ssim, dssim=dssim)


def evaluate_3d(iteration: int, recon: Image, stacks: List[Image],
                eval_mask: Image, tag: str, mask_name: str,
                csv_dir: str = ".") -> None:
    """Evaluate3d (cpp:1767-2151): reconstruction vs every input stack
    inside the 3x-dilated evaluation mask; one CSV row per stack."""
    md = np.asarray(dilate(eval_mask.data, 3, connectivity=26))
    dmask = Image((md > 0).astype(np.float32), eval_mask.attr.copy())
    csv_path = os.path.join(csv_dir, f"log-evaluate-{mask_name}.csv")
    for si, st in enumerate(stacks):
        # mask the stack by the evaluation mask resampled onto its grid
        m_on_stack = _resample_like(dmask, st) > 0.5
        ref = np.where(m_on_stack, np.asarray(st.data, np.float64), 0.0)
        tar = _resample_like(recon, st)
        valid = ref > 0
        n = max(int(valid.sum()), 1)
        mse = float(((ref - tar)[valid] ** 2).sum() / n)
        mx = float(ref.max()) if ref.max() > 0 else 1.0
        psnr = 20 * np.log10(mx) - 10 * np.log10(max(mse, 1e-30))
        ssim, dssim, _ = ssim_dssim(ref, tar, valid)
        ev = evaluate(Image(ref.astype(np.float32), st.attr.copy()), recon)
        _csv_row(csv_path, f"iter-{iteration}-stack-{si}-{tag}",
                 iteration == 0 and si == 0, mse, psnr, ssim, dssim, ev,
                 header_tag=tag)


def evaluate_baseline_3d(stacks: List[Image], gt: Image,
                         max_intensity: float, tag: str,
                         csv_path: str = "log-evaluate-baseline.csv"):
    """EvaluateBaseline3d (cpp:1451-1766): raw input stacks vs ground
    truth — the no-reconstruction baseline row."""
    for si, st in enumerate(stacks):
        ref = np.asarray(gt.data, np.float64)
        tar = _resample_like(st, gt)
        valid = ref > 0
        n = max(int(valid.sum()), 1)
        mse = float(((ref - tar)[valid] ** 2).sum() / n)
        psnr = 20 * np.log10(max(max_intensity, 1e-30)) \
            - 10 * np.log10(max(mse, 1e-30))
        ssim, dssim, _ = ssim_dssim(ref, tar, valid)
        ev = evaluate(gt, st)
        _csv_row(csv_path, f"baseline-stack-{si}-{tag}", si == 0,
                 mse, psnr, ssim, dssim, ev, header_tag=tag)


def dump_patches(batch, path: str) -> None:
    """--patchExtraction: dump the extracted patch batch for offline
    analysis (data + per-patch geometry)."""
    np.savez_compressed(path, data=batch.data, i2w=batch.i2w,
                        dims=batch.dims, stack_index=batch.stack_index)
