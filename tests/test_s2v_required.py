"""Slice-to-volume registration acceptance test.

Round-1 verdict: the old pipeline regression test ("must not be worse")
could never fail.  This one injects genuine PER-SLICE motion into the
simulated stacks — stack-level registration cannot undo it, so the
reconstruction with the slice-to-volume pass MUST beat the
no-registration run by a hard PSNR margin (mirrors what
registerMultipleSlicesToVolume, reconstruction_cuda2.cu:4001, is for).
"""
import numpy as np
import pytest

import jax.numpy as jnp

from fetalreconstruction_tpu.core.image import Image
from fetalreconstruction_tpu.ops.sampling import resample_to_grid
from fetalreconstruction_tpu.pipeline.config import SVRConfig
from fetalreconstruction_tpu.pipeline.svr import run_svr

from phantom import make_ground_truth, simulate_stacks, psnr


def _psnr_vs_gt(gt, out):
    gt_on = np.asarray(resample_to_grid(
        jnp.asarray(gt.data), jnp.asarray(gt.attr.w2i(), jnp.float32),
        out.attr.shape_zyx, jnp.asarray(out.attr.i2w(), jnp.float32)))
    roi = (gt_on > 1.0) & (out.data > 0)
    assert roi.mean() > 0.03
    return psnr(out.data[roi], gt_on[roi])


def test_s2v_registration_required_for_per_slice_motion():
    gt = make_ground_truth(n=28, spacing=1.5)
    rng = np.random.default_rng(3)
    # per-slice jitter: +-3 deg rotations, +-2 mm translations on every
    # other slice — well within the registration capture range but far
    # beyond what voxel-level robust statistics can absorb
    slice_motions = []
    for s in range(2):
        nz = 14  # generous upper bound; extra rows unused
        m = np.zeros((nz, 6))
        m[::2, :3] = rng.uniform(-2.0, 2.0, (len(m[::2]), 3))
        m[::2, 3:] = rng.uniform(-3.0, 3.0, (len(m[::2]), 3))
        slice_motions.append(m)
    stacks, _ = simulate_stacks(gt, n_stacks=2, in_plane=2.0, dz=3.0,
                                noise=0.5, slice_motions=slice_motions)
    mask_img = Image((gt.data > 1.0).astype(np.float32), gt.attr.copy())

    base = dict(resolution=1.6, rec_iterations_first=3,
                rec_iterations_last=4, smooth_mask=2.0,
                multires_levels=1, reg_levels=2, reg_iterations=8)
    res_noreg = run_svr(SVRConfig(iterations=1, **base), stacks=stacks,
                        mask=mask_img)
    res_reg = run_svr(SVRConfig(iterations=3, **base), stacks=stacks,
                      mask=mask_img)

    p0 = _psnr_vs_gt(gt, res_noreg.reconstructed)
    p1 = _psnr_vs_gt(gt, res_reg.reconstructed)
    # hard margin: registration must actually recover the injected motion
    assert p1 >= p0 + 1.0, f"s2v registration gain {p1 - p0:.2f} dB " \
                           f"(no-reg {p0:.2f} -> reg {p1:.2f})"
