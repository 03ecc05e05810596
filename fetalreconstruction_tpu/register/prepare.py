"""Host-side preparation for slice-to-volume registration.

Replicates PrepareRegistrationSlices (irtkReconstructionGPU.cc:2105-2164)
+ the SliceToVolumeRegistrationGPU origin bookkeeping (.cc:2218-2276):

- every slice is resampled with -1 padding to an isotropic grid at the
  reconstruction voxel size (irtkResamplingWithPadding); only ONE plane is
  kept (the packed registration target) — with a 1-plane source the
  padding-aware z-interpolation renormalizes to exactly the in-plane
  resample, so this equals the reference's combinedStacks content;
- all targets are packed into one (N, Hr, Wr) -1-padded batch;
- per slice we return Mo (translation by the resampled grid origin) and the
  origin-zeroed i2w, so the optimizer works in the slice-centred frame.

Documented deviation from the reference GPU path: the reference keeps
plane z=0 of the nz=int(thickness/dx)-plane resampled slab but attributes
it to that plane's own world position (irtkReconstructionGPU.cc:2151
`slice(x, y, 0)` + :2246 full resampled I2W), which sits (nz-1)/2 voxels
off the true slice plane — a systematic through-plane bias of every
optimized transform (the reference's own CPU registration path has no
such bias: it registers the full slab whose replicated content is
symmetric about the slice plane; cf. the ".cc:2253 slightly different
results. investigate this" comment).  Here the kept plane's grid is a
single-plane attr at the slice origin, so the content is attributed to
the slice plane itself and the ±2-voxel through-plane cost offsets
(evaluateCostsMultipleSlices) sample symmetrically around it.

Within a stack every slice shares the same in-plane mapping (origins cancel
in w2i_slice @ i2w_resampled), so the resample vectorizes per stack.
"""
from __future__ import annotations

from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.geometry import ImageAttributes
from ..ops.sampling import sample_linear_padded
from ..pipeline.state import SliceBatch


def prepare_registration_slices(batch: SliceBatch, recon_dx: float):
    """Resample every slice to isotropic recon_dx (in-plane) with -1 padding.

    Returns (targets (N, Hr, Wr) float32, mo (N,4,4), ofs_i2w (N,4,4)).
    """
    n = batch.n_slices
    # group slices by stack (same geometry within a stack)
    resampled: List[np.ndarray] = [None] * n
    mo = np.zeros((n, 4, 4))
    ofs_i2w = np.zeros((n, 4, 4))
    shapes = []
    per_stack = {}
    for idx in range(n):
        per_stack.setdefault(int(batch.stack_index[idx]), []).append(idx)

    for sidx, members in per_stack.items():
        a0 = batch.attrs[members[0]]
        dst0 = a0.with_spacing(recon_dx, recon_dx, recon_dx)
        dst0.z = 1  # single plane AT the slice origin (see module docstring)
        # mapping dst plane-0 pixel -> source slice voxel (origin-independent)
        m = a0.w2i() @ dst0.i2w()
        h, w = dst0.y, dst0.x
        xs, ys = np.meshgrid(np.arange(w, dtype=np.float32),
                             np.arange(h, dtype=np.float32))
        pts = np.stack([xs, ys, np.zeros_like(xs)], axis=-1).reshape(-1, 3)
        spts = pts @ m[:3, :3].T + m[:3, 3]
        spts = jnp.asarray(spts, jnp.float32)
        src = jnp.asarray(
            batch.data[members][:, None, :, :])  # (M,1,H,W) as [z,y,x]
        vals = jax.vmap(lambda v: sample_linear_padded(v, spts,
                                                       padding=-1.0))(src)
        vals = np.asarray(vals).reshape(len(members), h, w)
        for j, idx in enumerate(members):
            resampled[idx] = vals[j]
            a = batch.attrs[idx]
            dst = a.with_spacing(recon_dx, recon_dx, recon_dx)
            dst.z = 1
            t = np.eye(4)
            t[:3, 3] = dst.origin
            mo[idx] = t
            z = dst.copy()
            z.xorigin = z.yorigin = z.zorigin = 0.0
            ofs_i2w[idx] = z.i2w()
        shapes.append((h, w))

    hr = max(s[0] for s in shapes)
    wr = max(s[1] for s in shapes)
    targets = np.full((n, hr, wr), -1.0, np.float32)
    for idx in range(n):
        rh, rw = resampled[idx].shape
        targets[idx, :rh, :rw] = resampled[idx]
    return targets, mo.astype(np.float32), ofs_i2w.astype(np.float32)
