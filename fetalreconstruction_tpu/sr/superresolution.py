"""Super-resolution update + edge-preserving adaptive regularization.

Reimplements (vectorized, shift-based — no atomics):
- SuperresolutionKernel3D_tex scatter of residuals -> addon/confidence map
  (reconstruction_cuda2.cu:408-520) via ops.psf.psf_scatter;
- the non-adaptive addon /= cmap step and intensity clamping
  (irtkReconstructionGPU.cc:4080-4102);
- AdaptiveRegularization passes 1+2 (.cc:4265-4430): 13-direction
  edge-preserving weighted diffusion with confidence-map weighting.

The 13 directions and factor[i] = 1/L1-norm match .cc:189-206/4399-4404.
Out-of-bounds neighbour terms vanish exactly like the reference's bounds
checks because shifts zero-fill.
"""
from __future__ import annotations

from typing import Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from ..em.robust import corrected_slice
from ..ops import psf as psf_ops

DIRECTIONS = np.array([
    [1, 0, -1], [0, 1, -1], [1, 1, -1], [1, -1, -1],
    [1, 0, 0], [0, 1, 0], [1, 1, 0], [1, -1, 0],
    [1, 0, 1], [0, 1, 1], [1, 1, 1], [1, -1, 1],
    [0, 0, 1]], dtype=np.int32)
FACTORS = (1.0 / np.abs(DIRECTIONS).sum(axis=1)).astype(np.float64)


def smoothing_parameters(delta: float, lambda_user: float):
    """The reference's SetSmoothingParameters
    (irtkReconstructionGPU.h:605-612): returns (alpha, lambda_eff) with
    lambda_eff = lambda*delta^2 and alpha = min(0.05/lambda, 1).  The
    regularization weight alpha*lambda_eff/delta^2 then equals
    min(0.05, lambda)."""
    alpha = min(0.05 / lambda_user, 1.0)
    return alpha, lambda_user * delta * delta


def shift3d(arr, d: Sequence[int]):
    """arr shifted so that out[z,y,x] = arr[z+dz, y+dy, x+dx], zero-filled.

    d = (dx, dy, dz) in (x, y, z) order; arr is [z, y, x].
    """
    dx, dy, dz = int(d[0]), int(d[1]), int(d[2])
    out = arr
    for axis, s in ((0, dz), (1, dy), (2, dx)):
        if s == 0:
            continue
        n = out.shape[axis]
        idx = [slice(None)] * 3
        pad = [(0, 0)] * 3
        if s > 0:
            idx[axis] = slice(s, n)
            pad[axis] = (0, s)
        else:
            idx[axis] = slice(0, n + s)
            pad[axis] = (-s, 0)
        out = jnp.pad(out[tuple(idx)], pad)
    return out


def _inbounds3d(shape_zyx, d):
    """Boolean field: voxel + d is inside the volume."""
    zs, ys, xs = shape_zyx
    dx, dy, dz = int(d[0]), int(d[1]), int(d[2])
    z = jnp.arange(zs)[:, None, None]
    y = jnp.arange(ys)[None, :, None]
    x = jnp.arange(xs)[None, None, :]
    return ((x + dx >= 0) & (x + dx < xs) & (y + dy >= 0) & (y + dy < ys)
            & (z + dz >= 0) & (z + dz < zs))


def sr_accumulate(geom, offsets, sume, slices, valid, bias, scale,
                  weights, slice_weight, sim, mask_flat, vol_shape,
                  disable_bias: bool = False):
    """Scatter residuals: returns (addon, cmap) as [z,y,x] volumes.

    Residual = s*e^-b*scale - sim (0 where sim <= 0), payloads weighted by
    voxel weight * slice weight (SuperresolutionKernel3D_tex).
    """
    if disable_bias:
        s = slices * scale[:, None, None]
    else:
        s = corrected_slice(slices, bias, scale)
    resid = jnp.where(sim > 0.0, s - sim, 0.0)
    wfac = weights * slice_weight[:, None, None]
    gate = valid & (sume > 0.0)
    p_addon = jnp.where(gate, resid * wfac, 0.0)
    p_cmap = jnp.where(gate, wfac, 0.0)
    addon, cmap = psf_ops.psf_scatter(geom, offsets, sume,
                                      [p_addon, p_cmap], mask_flat,
                                      vol_shape)
    return addon.reshape(vol_shape), cmap.reshape(vol_shape)


def apply_addon(recon, addon, cmap, alpha, min_intensity, max_intensity,
                adaptive: bool = False):
    """recon += alpha * addon (addon /= cmap first if non-adaptive), clamp
    to [0.9*min, 1.1*max] (.cc:4080-4102).  Returns (recon, cmap_out)."""
    if not adaptive:
        addon = jnp.where(cmap > 0, addon / jnp.where(cmap > 0, cmap, 1.0),
                          addon)
        cmap = jnp.where(cmap > 0, 1.0, cmap)
    recon = recon + alpha * addon
    recon = jnp.clip(recon, 0.9 * min_intensity, 1.1 * max_intensity)
    return recon, cmap


def adaptive_regularization(recon, original, cmap, alpha, lambda_, delta):
    """13-direction edge-preserving regularization (both passes).

    recon: volume AFTER the addon update; original: volume BEFORE
    (the reference passes `original` to pass 1 and the post-addon volume
    to pass 2 as `original2`).
    """
    shape = recon.shape
    # pass 1: b[i] = factor/sqrt(1 + diff^2), diff from `original`
    bs = []
    for i, d in enumerate(DIRECTIONS):
        f = float(FACTORS[i])
        o_sh = shift3d(original, d)
        c_sh = shift3d(cmap, d)
        inb = _inbounds3d(shape, d)
        diff = (o_sh - original) * np.sqrt(f) / delta
        bi = jnp.where(inb & (cmap > 0) & (c_sh > 0),
                       f / jnp.sqrt(1.0 + diff * diff), 0.0)
        bs.append(bi)

    # pass 2 operates on the post-addon volume
    original2 = recon
    val = jnp.zeros_like(recon)
    valw = jnp.zeros_like(recon)
    ssum = jnp.zeros_like(recon)
    for i, d in enumerate(DIRECTIONS):
        nd = [-int(x) for x in d]
        inb_p = _inbounds3d(shape, d)
        inb_m = _inbounds3d(shape, nd)
        o_p = shift3d(original2, d)
        c_p = shift3d(cmap, d)
        val = val + jnp.where(inb_p, bs[i] * o_p * c_p, 0.0)
        valw = valw + jnp.where(inb_p, bs[i] * c_p, 0.0)
        ssum = ssum + jnp.where(inb_p, bs[i], 0.0)
        b_m = shift3d(bs[i], nd)
        o_m = shift3d(original2, nd)
        c_m = shift3d(cmap, nd)
        val = val + jnp.where(inb_m, b_m * o_m * c_m, 0.0)
        valw = valw + jnp.where(inb_m, b_m * c_m, 0.0)
        ssum = ssum + jnp.where(inb_m, b_m, 0.0)

    val = val - ssum * original2 * cmap
    valw = valw - ssum * cmap
    reg = alpha * lambda_ / (delta * delta)
    val = original2 * cmap + reg * val
    valw = cmap + reg * valw
    return jnp.where(valw > 0, val / jnp.where(valw > 0, valw, 1.0), 0.0)


def equalize(recon_num, vol_weights):
    """Divide PSF-accumulated volume by volume weights (equalizeVol)."""
    ok = vol_weights > 0
    return jnp.where(ok, recon_num / jnp.where(ok, vol_weights, 1.0),
                     recon_num)


def mask_volume(recon, mask):
    """Outside-mask voxels -> -1 (MaskVolume, .cc:5325)."""
    return jnp.where(mask == 0, -1.0, recon)
