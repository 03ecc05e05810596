"""Manual segmentation mask pushed through the PSF into recon space.

Reimplements transformManualMaskwithPSF (irtkReconstructionGPU.cc:4824 +
psfManualMaskTransform, reconstruction_cuda2.cu:5302): the per-slice manual
mask values are scattered into the volume with the same PSF weighting as
the data, then thresholded — giving a reconstruction-space segmentation
consistent with the motion-corrected slices."""
from __future__ import annotations

import jax.numpy as jnp


def transform_manual_mask(ctx, geom, sume, mask_slices_batch, valid,
                          mask_flat, threshold: float = 0.5):
    """mask_slices_batch: (N,H,W) manual mask (0/1) per slice; returns a
    [z,y,x] binary volume."""
    from ..ops import psf as psf_ops
    from ..ops import psf_fast

    gate = valid & (sume > 0)
    pay = jnp.where(gate, mask_slices_batch, 0.0)
    ones = jnp.where(gate, 1.0, 0.0)
    if ctx.fast is not None:
        num, den = psf_fast.fast_scatter2(
            ctx.fast, geom, pay, ones, mask_flat.reshape(ctx.vol_shape),
            ctx.vol_shape)
    else:
        num, den = psf_ops.psf_scatter(geom, ctx.offsets, sume,
                                       [pay, ones], mask_flat,
                                       ctx.vol_shape)
        num = num.reshape(ctx.vol_shape)
        den = den.reshape(ctx.vol_shape)
    frac = jnp.where(den > 0, num / jnp.where(den > 0, den, 1.0), 0.0)
    return (frac > threshold).astype(jnp.float32)
