"""PVR (patch-to-volume reconstruction) pipeline.

Reimplements the PVRreconstructionGPU application flow
(patchBasedReconMain.cpp:51-440 + irtkPatchBasedReconstruction.cpp:194-593
/ SURVEY.md §3.2):

- mask from stack overlap when none given (CreateMaskFromOverlap is the
  PVR default), binarize, dilate (--dilateMask), crop, optional resample;
- stack-to-stack 3D-3D registration, intensity matching, template;
- square patches (--patchSize/--patchStride) or full slices
  (--useFullSlices) extracted per stack — each patch carries its own rigid
  transform, scale and weight;
- the same EM/SR engine as SVR, with patch-to-volume registration in place
  of slice-to-volume;
- hierarchical mode (--hierarchical): coarse-to-fine patch sizes
  (size - 4, stride - 2 per level, patchBasedReconMain.cpp:422-431), each
  level seeded by the previous reconstruction;
- thickness convention: the CLI HALVES the given thickness
  (patchBasedReconMain.cpp:208-217), patches then use 2x that — net the
  given value.
"""
from __future__ import annotations

import dataclasses
import os
from typing import List, Optional

import numpy as np

import jax.numpy as jnp

from ..core.image import Image
from ..io.nifti import read_nifti
from ..ops.morphology import dilate
from ..patches.extract import extract_patches
from .config import SVRConfig
from .svr import (SVRResult, create_mask_from_overlap, run_svr)


@dataclasses.dataclass
class PVRConfig(SVRConfig):
    patch_size: int = 64
    patch_stride: int = 32
    use_full_slices: bool = False
    superpixel: bool = False
    spx_size: int = 64
    spx_extend: int = 50  # 0-100 % ratio of superpixel size (patchBasedReconMain.cpp:106)
    hierarchical: bool = False
    hier_levels: int = 3
    dilate_mask: int = 0
    resample: bool = False  # resample stacks to the recon resolution
                            # before reconstruction
                            # (irtkPatchBasedReconstruction.cpp:237-245)
    # research-evaluation harness (patchBasedReconMain.cpp:137-144)
    evaluate_gt: str = ""                 # --evaluateGt <gt.nii.gz>
    evaluation_masks: List[str] = dataclasses.field(default_factory=list)
    evaluate_baseline: bool = False       # --evaluateBaseline
    patch_extraction: bool = False        # --patchExtraction
    evaluate_2d: bool = False             # also run the per-PATCH 2D
                                          # battery (Evaluate2d /
                                          # EvaluateBaseline2d CSVs)


def run_pvr(cfg: PVRConfig, stacks: Optional[List[Image]] = None,
            mask: Optional[Image] = None, mesh=None) -> SVRResult:
    if stacks is None:
        stacks = [read_nifti(p) for p in cfg.input_stacks]
    if mask is None and cfg.mask is not None:
        mask = read_nifti(cfg.mask)
    if mask is None:
        # PVR default: overlap mask (irtkPatchBasedReconstruction.cpp:196)
        mask = create_mask_from_overlap(stacks)
        mask = Image((mask.data > 0).astype(np.float32), mask.attr)
    if cfg.dilate_mask > 0:
        mask = Image(dilate(mask.data, cfg.dilate_mask).astype(np.float32),
                     mask.attr)
    if cfg.resample:
        # resample input stacks (cubic B-spline, matching the
        # reference's irtkBSplineInterpolateImageFunction) and mask (NN)
        # to the isotropic recon resolution
        # (irtkPatchBasedReconstruction.cpp:229-266)
        from ..ops.sampling import resample_to_grid
        import jax.numpy as jnp
        res = cfg.resolution
        out = []
        for st in stacks:
            a = st.attr.with_spacing(res, res, res)
            d = resample_to_grid(np.asarray(st.data, np.float32),
                                 st.attr.w2i(), a.shape_zyx, a.i2w(),
                                 interp="bspline", padding=0.0)
            out.append(Image(np.asarray(d), a))
        stacks = out
        ma = mask.attr.with_spacing(res, res, res)
        md = resample_to_grid(jnp.asarray(mask.data, jnp.float32),
                              jnp.asarray(mask.attr.w2i(), jnp.float32),
                              ma.shape_zyx,
                              jnp.asarray(ma.i2w(), jnp.float32),
                              interp="nn", padding=0.0)
        mask = Image(np.asarray(md), ma)

    if not cfg.hierarchical:
        return _run_level(cfg, stacks, mask, cfg.patch_size,
                          cfg.patch_stride, initial=None, mesh=mesh)

    # hierarchical coarse-to-fine (patchBasedReconMain.cpp:422-431)
    size, stride = cfg.patch_size, cfg.patch_stride
    sizes = []
    for _ in range(cfg.hier_levels):
        sizes.append((size, stride))
        size = max(size - 4, 8)
        stride = max(stride - 2, 4)
    result = None
    for (psize, pstride) in sizes:
        result = _run_level(cfg, stacks, mask, psize, pstride,
                            initial=result.reconstructed if result else None,
                            mesh=mesh)
    return result


def _run_level(cfg: PVRConfig, stacks, mask, patch_size, patch_stride,
               initial: Optional[Image], mesh=None) -> SVRResult:
    if cfg.superpixel:
        from ..patches.slic import extract_superpixel_patches

        def base_factory(cropped_stacks, thickness, recon_mask_img,
                         stack_transforms):
            return extract_superpixel_patches(
                cropped_stacks, thickness, spx_size=cfg.spx_size,
                spx_extend=cfg.spx_extend)
    else:
        def base_factory(cropped_stacks, thickness, recon_mask_img,
                         stack_transforms):
            return extract_patches(
                cropped_stacks, thickness, patch_size, patch_stride,
                mask=recon_mask_img, stack_transforms=stack_transforms,
                use_full_slices=cfg.use_full_slices)

    batch_cell = {}

    def factory(*a):
        batch = base_factory(*a)
        batch_cell["batch"] = batch
        if cfg.patch_extraction:
            # --patchExtraction: dump the patch batch
            # (irtkPatchBasedReconstruction.cpp:351-385)
            from ..evaluation.pvr_eval import dump_patches
            dump_patches(batch, f"{cfg.log_prefix}patches_{patch_size}"
                                f"_{patch_stride}.npz")
        return batch

    # per-iteration evaluation CSVs (Evaluate3d/EvaluateGt3d, cpp:570-580)
    hook = None
    tag = f"patch-size-{patch_size}-stride-{patch_stride}"
    gt_img = read_nifti(cfg.evaluate_gt) if cfg.evaluate_gt else None
    if gt_img is not None and cfg.evaluate_baseline:
        from ..evaluation.pvr_eval import evaluate_baseline_3d
        mx = max(float(np.max(s.data)) for s in stacks)
        evaluate_baseline_3d(stacks, gt_img, mx, tag)
    if gt_img is not None or cfg.evaluation_masks:
        from ..evaluation import pvr_eval

        def hook(it, recon_img, transforms=None):
            if gt_img is not None:
                pvr_eval.evaluate_gt_3d(
                    it, recon_img, gt_img,
                    float(np.max(gt_img.data)), tag,
                    dssim_path=f"dssim-iter-{it}-size-{patch_size}"
                               f"-{patch_stride}.nii.gz")
            mx = max(float(np.max(s.data)) for s in stacks)
            mn = min(float(np.min(s.data)) for s in stacks)
            for mpath in cfg.evaluation_masks:
                em = read_nifti(mpath)
                name = os.path.splitext(
                    os.path.basename(mpath))[0].replace(".nii", "")
                pvr_eval.evaluate_3d(it, recon_img, stacks, em, tag, name)
                if cfg.evaluate_2d and "batch" in batch_cell:
                    # per-patch 2D battery (Evaluate2d, cpp:1236-1449)
                    b = batch_cell["batch"]
                    t = transforms if transforms is not None else \
                        np.tile(np.eye(4), (b.n_slices, 1, 1))
                    pvr_eval.evaluate_2d(
                        it, recon_img, b, t, em, name, patch_size,
                        patch_stride, mn, mx)
                    if it == 0 and cfg.evaluate_baseline:
                        pvr_eval.evaluate_baseline_2d(
                            b, stacks, em, name, patch_size,
                            patch_stride, mn, mx)

    return run_svr(cfg, stacks=stacks, mask=mask, slice_factory=factory,
                   reference_volume=initial, iteration_hook=hook, mesh=mesh)
