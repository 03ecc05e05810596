"""Interpolation / resampling primitives (JAX, TPU-friendly gathers).

Replaces the reference's interpolator hierarchy
(IRTKSimple2/image++/src/irtkLinearInterpolateImageFunction.cc,
irtkResampling.cc, irtkResamplingWithPadding.cc) with vectorized gathers.

Conventions replicated exactly:
- trilinear weights from floor/frac (irtkResamplingWithPadding.cc:300-360);
- padding rule: a corner contributes if it is in-bounds and != padding;
  `pad` counts in-bounds corners equal to padding; output is the
  renormalized sum if pad < 4 and sum > 0, else the padding value
  (irtkResamplingWithPadding.cc:402-415);
- nearest-neighbour uses round() (irtkNearestNeighborInterpolateImageFunction).

Volumes are indexed [z, y, x]; point coordinates are (x, y, z) continuous
voxel indices.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def _flat_gather(vol, ix, iy, iz):
    """Gather vol[z,y,x] at integer index arrays (clamped)."""
    zs, ys, xs = vol.shape
    ixc = jnp.clip(ix, 0, xs - 1)
    iyc = jnp.clip(iy, 0, ys - 1)
    izc = jnp.clip(iz, 0, zs - 1)
    lin = (izc * (ys * xs) + iyc * xs + ixc).astype(jnp.int32)
    return jnp.take(vol.reshape(-1), lin, axis=0)


def sample_linear(vol, pts, padding=0.0):
    """Plain trilinear sampling; out-of-bounds -> padding.

    vol: (Z, Y, X); pts: (..., 3) in (x, y, z) voxel coords.
    """
    zs, ys, xs = vol.shape
    x, y, z = pts[..., 0], pts[..., 1], pts[..., 2]
    u = jnp.floor(x); v = jnp.floor(y); w = jnp.floor(z)
    dx = x - u; dy = y - v; dz = z - w
    u = u.astype(jnp.int32); v = v.astype(jnp.int32); w = w.astype(jnp.int32)
    out = jnp.zeros_like(x)
    wsum = jnp.zeros_like(x)
    for du in (0, 1):
        for dv in (0, 1):
            for dw in (0, 1):
                wgt = ((dx if du else 1 - dx) * (dy if dv else 1 - dy)
                       * (dz if dw else 1 - dz))
                iu, iv, iw = u + du, v + dv, w + dw
                inb = ((iu >= 0) & (iu < xs) & (iv >= 0) & (iv < ys)
                       & (iw >= 0) & (iw < zs))
                val = _flat_gather(vol, iu, iv, iw)
                out = out + jnp.where(inb, wgt * val, 0.0)
                wsum = wsum + jnp.where(inb, wgt, 0.0)
    return jnp.where(wsum > 0.999999, out,
                     jnp.where(wsum > 0, out + (1 - wsum) * padding, padding))


def sample_linear_padded(vol, pts, padding=-1.0):
    """Padding-aware trilinear sampling (irtkResamplingWithPadding rule).

    Corners that are out-of-bounds or equal to `padding` are dropped; if
    fewer than 4 in-bounds corners equal padding and the remaining weight
    is positive, returns the renormalized weighted mean, else `padding`.
    """
    zs, ys, xs = vol.shape
    x, y, z = pts[..., 0], pts[..., 1], pts[..., 2]
    u = jnp.floor(x); v = jnp.floor(y); w = jnp.floor(z)
    dx = x - u; dy = y - v; dz = z - w
    u = u.astype(jnp.int32); v = v.astype(jnp.int32); w = w.astype(jnp.int32)
    val_sum = jnp.zeros_like(x)
    wgt_sum = jnp.zeros_like(x)
    pad_count = jnp.zeros(x.shape, jnp.int32)
    for du in (0, 1):
        for dv in (0, 1):
            for dw in (0, 1):
                wgt = ((dx if du else 1 - dx) * (dy if dv else 1 - dy)
                       * (dz if dw else 1 - dz))
                iu, iv, iw = u + du, v + dv, w + dw
                inb = ((iu >= 0) & (iu < xs) & (iv >= 0) & (iv < ys)
                       & (iw >= 0) & (iw < zs))
                val = _flat_gather(vol, iu, iv, iw)
                is_pad = inb & (val == padding)
                use = inb & (val != padding)
                val_sum = val_sum + jnp.where(use, wgt * val, 0.0)
                wgt_sum = wgt_sum + jnp.where(use, wgt, 0.0)
                pad_count = pad_count + is_pad.astype(jnp.int32)
    ok = (pad_count < 4) & (wgt_sum > 0)
    return jnp.where(ok, val_sum / jnp.where(wgt_sum > 0, wgt_sum, 1.0),
                     padding)


def sample_nearest(vol, pts, padding=0.0):
    """Nearest-neighbour sampling; out-of-bounds -> padding."""
    zs, ys, xs = vol.shape
    ix = jnp.round(pts[..., 0]).astype(jnp.int32)
    iy = jnp.round(pts[..., 1]).astype(jnp.int32)
    iz = jnp.round(pts[..., 2]).astype(jnp.int32)
    inb = ((ix >= 0) & (ix < xs) & (iy >= 0) & (iy < ys)
           & (iz >= 0) & (iz < zs))
    return jnp.where(inb, _flat_gather(vol, ix, iy, iz), padding)


def grid_points(shape_zyx, dtype=jnp.float32):
    """(Z*Y*X, 3) grid of (x, y, z) voxel indices for a [z,y,x] volume."""
    zs, ys, xs = shape_zyx
    z, y, x = jnp.meshgrid(jnp.arange(zs, dtype=dtype),
                           jnp.arange(ys, dtype=dtype),
                           jnp.arange(xs, dtype=dtype), indexing="ij")
    return jnp.stack([x, y, z], axis=-1).reshape(-1, 3)


from functools import partial as _partial


def resample_to_grid(src_vol, src_w2i, dst_shape_zyx, dst_i2w,
                     interp="linear", padding=0.0, source_padding=None):
    """Hashable-coercing wrapper over the jitted implementation.

    interp="bspline" is the cubic B-spline interpolator
    (irtkBSplineInterpolateImageFunction: prefilter the image into
    B-spline coefficients, then evaluate the cubic spline) used by the
    reference for PVR grey-stack resampling
    (irtkPatchBasedReconstruction.cpp:237-245).  It is a ONE-SHOT
    host-side prep operation (once per pipeline, before any device
    loop), so it runs through scipy's separable IIR prefilter +
    map_coordinates rather than a jitted gather — the hot resample
    paths stay on the linear/nn device kernels.
    """
    if str(interp) == "bspline":
        from scipy import ndimage
        m = np.asarray(src_w2i, np.float64) @ np.asarray(dst_i2w,
                                                         np.float64)
        dst = tuple(int(s) for s in dst_shape_zyx)
        pts = np.asarray(grid_points(dst, dtype=jnp.float32), np.float64)
        spts = pts @ m[:3, :3].T + m[:3, 3]
        # map_coordinates wants (z, y, x) index order
        coords = spts[:, ::-1].T
        out = ndimage.map_coordinates(
            np.asarray(src_vol, np.float64), coords, order=3,
            mode="constant", cval=float(padding), prefilter=True)
        return jnp.asarray(out.reshape(dst).astype(np.float32))
    return _resample_to_grid_jit(
        src_vol, src_w2i, tuple(int(s) for s in dst_shape_zyx), dst_i2w,
        str(interp), float(padding),
        None if source_padding is None else float(source_padding))


@_partial(jax.jit, static_argnames=("dst_shape_zyx", "interp", "padding",
                                    "source_padding"))
def _resample_to_grid_jit(src_vol, src_w2i, dst_shape_zyx, dst_i2w,
                          interp="linear", padding=0.0,
                          source_padding=None):
    """Resample src into a destination grid (jitted: callers dispatch
    dozens of these eagerly during host-side prep, and through the axon
    tunnel every un-jitted op pays a per-op compile — template+mask and
    the stack-registration pyramid prep measured 145 s + ~400 s of a
    984 s chip run before this wrapper).

    dst_shape_zyx must be a TUPLE (static), paddings python floats.

    src_w2i/dst_i2w: 4x4 matrices (IRTK convention).  Equivalent to
    irtkResampling / irtkResamplingWithPadding / irtkImageTransformation
    depending on the matrices passed (compose a rigid transform into them
    for transformed resampling).
    """
    m = jnp.asarray(np.asarray(src_w2i) @ np.asarray(dst_i2w)
                    if isinstance(src_w2i, np.ndarray)
                    and isinstance(dst_i2w, np.ndarray)
                    else src_w2i @ dst_i2w, dtype=src_vol.dtype)
    pts = grid_points(dst_shape_zyx, dtype=src_vol.dtype)
    spts = pts @ m[:3, :3].T + m[:3, 3]
    if interp == "linear":
        if source_padding is not None:
            out = sample_linear_padded(src_vol, spts, padding=source_padding)
        else:
            out = sample_linear(src_vol, spts, padding=padding)
    elif interp == "nn":
        out = sample_nearest(src_vol, spts, padding=padding)
    else:
        raise ValueError(interp)
    return out.reshape(dst_shape_zyx)
