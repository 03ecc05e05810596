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
    spx_extend: int = 8
    hierarchical: bool = False
    hier_levels: int = 3
    dilate_mask: int = 0
    resample: float = 0.0  # optional stack resampling (mm)


def run_pvr(cfg: PVRConfig, stacks: Optional[List[Image]] = None,
            mask: Optional[Image] = None) -> SVRResult:
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

    if not cfg.hierarchical:
        return _run_level(cfg, stacks, mask, cfg.patch_size,
                          cfg.patch_stride, initial=None)

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
                            initial=result.reconstructed if result else None)
    return result


def _run_level(cfg: PVRConfig, stacks, mask, patch_size, patch_stride,
               initial: Optional[Image]) -> SVRResult:
    if cfg.superpixel:
        from ..patches.slic import extract_superpixel_patches

        def factory(cropped_stacks, thickness, recon_mask_img,
                    stack_transforms):
            return extract_superpixel_patches(
                cropped_stacks, thickness, spx_size=cfg.spx_size,
                spx_extend=cfg.spx_extend)
    else:
        def factory(cropped_stacks, thickness, recon_mask_img,
                    stack_transforms):
            return extract_patches(
                cropped_stacks, thickness, patch_size, patch_stride,
                mask=recon_mask_img, stack_transforms=stack_transforms,
                use_full_slices=cfg.use_full_slices)

    return run_svr(cfg, stacks=stacks, mask=mask, slice_factory=factory,
                   reference_volume=initial)
