"""Synthetic phantom generation for end-to-end tests and benchmarks.

The bundled reference data contains only the brain mask (stacks are
downloaded separately upstream), so tests synthesize a ground-truth volume
and derive motion-corrupted thick-slice stacks from it through the same
PSF forward model the reconstructor inverts.
"""
import numpy as np

import jax.numpy as jnp

from fetalreconstruction_tpu.core.geometry import (ImageAttributes,
                                                   rigid_matrix)
from fetalreconstruction_tpu.core.image import Image
from fetalreconstruction_tpu.ops import psf as psf_ops
from fetalreconstruction_tpu.pipeline.state import create_slices
from fetalreconstruction_tpu.pipeline import svr_core


def make_ground_truth(n=36, spacing=1.5, seed=7):
    """Structured GT volume: ellipsoid 'head' with internal blobs plus
    smooth asymmetric texture (so rotations are identifiable)."""
    from scipy import ndimage
    a = ImageAttributes(x=n, y=n, z=n, dx=spacing, dy=spacing, dz=spacing)
    z, y, x = np.meshgrid(*[np.linspace(-1, 1, n)] * 3, indexing="ij")
    r = np.sqrt(x ** 2 + 1.2 * y ** 2 + 1.1 * z ** 2)
    vol = np.where(r < 0.85, 60.0 + 40.0 * np.cos(3 * np.pi * r), 0.0)
    blob = 30.0 * np.exp(-(((x - 0.3) ** 2 + (y + 0.2) ** 2 + z ** 2)
                           / 0.05))
    rng = np.random.default_rng(seed)
    texture = ndimage.gaussian_filter(rng.normal(0, 1, (n, n, n)), 1.5)
    texture = 40.0 * texture / max(np.abs(texture).max(), 1e-6)
    vol = vol + blob + np.where(r < 0.85, texture, 0.0)
    vol = np.maximum(vol, 0)
    vol[vol < 0.01] = 0.0  # clean background (corner-based padding guess)
    return Image(vol.astype(np.float32), a)


def make_stack_attr(gt: Image, rot_deg, in_plane=2.0, dz=3.0):
    """Stack grid covering the GT extent, with its own spacing.

    rot_deg: acquisition orientation as Euler degrees (rx, ry, rz) — the
    grid AXES are rotated (an oblique/orthogonal acquisition), centred on
    the GT.  Orthogonal stacks make through-plane motion of one stack
    observable in-plane by another — the reason the reference's example
    data ships multiple differently-oriented stacks.
    """
    rot = list(rot_deg) if rot_deg is not None else [0.0, 0.0, 0.0]
    if len(rot) == 6:
        rot = rot[3:]
    R = rigid_matrix([0.0, 0.0, 0.0] + list(rot))[:3, :3]
    ext = np.array([gt.attr.x * gt.attr.dx, gt.attr.y * gt.attr.dy,
                    gt.attr.z * gt.attr.dz])
    # coverage needed along each rotated axis
    need = np.abs(R).T @ ext
    a = ImageAttributes(x=int(need[0] / in_plane),
                        y=int(need[1] / in_plane),
                        z=int(need[2] / dz), dx=in_plane, dy=in_plane,
                        dz=dz,
                        xaxis=tuple(R[:, 0]), yaxis=tuple(R[:, 1]),
                        zaxis=tuple(R[:, 2]))
    a.xorigin, a.yorigin, a.zorigin = (gt.attr.xorigin, gt.attr.yorigin,
                                       gt.attr.zorigin)
    return a


def simulate_stacks(gt: Image, n_stacks=2, thickness=None, in_plane=2.0,
                    dz=3.0, motions=None, noise=0.0, seed=0,
                    slice_motions=None, orientations=None):
    """Forward-simulate thick-slice stacks from GT through the PSF model.

    motions: list of per-stack 6-param rigid motions (slice transform).
    slice_motions: optional list (per stack) of (n_slices, 6) PER-SLICE
    rigid jitter — composed on top of the stack motion, so the simulated
    stack has genuine inter-slice motion that only slice-to-volume
    registration can undo.
    orientations: optional list of per-stack acquisition orientations
    (Euler degrees, see make_stack_attr) — orthogonal stacks are what
    makes through-plane motion recoverable, as in the reference's
    multi-orientation example data.
    Returns (stacks, true_transforms_per_stack).
    """
    rng = np.random.default_rng(seed)
    stacks, transforms = [], []
    for s in range(n_stacks):
        rot = [0, 0, 0, 0, 0, 0] if motions is None else motions[s]
        ori = None if orientations is None else orientations[s]
        attr = make_stack_attr(gt, ori, in_plane, dz)
        t = rigid_matrix(rot)
        th = thickness or 2 * dz
        stack_img = Image(np.zeros(attr.shape_zyx, np.float32), attr)
        batch = create_slices([stack_img], [th])
        if slice_motions is not None and slice_motions[s] is not None:
            per = np.stack([rigid_matrix(p) @ t
                            for p in slice_motions[s]])
            fwd = np.einsum("ij,njk,nkl->nil", gt.attr.w2i(), per,
                            batch.i2w)
        else:
            fwd = np.einsum("ij,jk,nkl->nil", gt.attr.w2i(), t, batch.i2w)
        geom = psf_ops.make_slice_geom(jnp.asarray(fwd, jnp.float32),
                                       jnp.asarray(batch.dims),
                                       jnp.ones(batch.data.shape, bool))
        support = psf_ops.reference_support(batch.dims, gt.attr.dx, 1.0)
        offsets = psf_ops.make_offsets(support)
        sume = psf_ops.psf_sums(geom, offsets, gt.attr.shape_zyx)
        sim, simw, inside = psf_ops.psf_gather(
            geom, offsets, sume, jnp.asarray(gt.data).reshape(-1),
            jnp.ones(gt.data.size, jnp.float32), gt.attr.shape_zyx)
        data = np.asarray(sim).reshape(attr.z, attr.y, attr.x)
        if noise > 0:
            data = data + rng.normal(0, noise, data.shape)
        stacks.append(Image(np.maximum(data, 0).astype(np.float32), attr))
        transforms.append(t)
    return stacks, transforms


def mask_slices(batch, threshold=1.0):
    """Set near-empty background pixels to -1 padding, mimicking
    irtkReconstruction::MaskSlices (outside-mask voxels -> -1)."""
    batch.data[batch.data < threshold] = -1.0
    return batch


def recon_mask(gt, dilate_vox=2):
    from scipy import ndimage
    m = (gt.data > 1.0)
    if dilate_vox:
        m = ndimage.binary_dilation(m, iterations=dilate_vox)
    return m.astype(np.float32)


def psnr(a, b, mask=None):
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    if mask is not None:
        a, b = a[mask], b[mask]
    mse = np.mean((a - b) ** 2)
    peak = b.max() - b.min()
    return 10 * np.log10(peak * peak / max(mse, 1e-12))
