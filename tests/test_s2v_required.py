"""Slice-to-volume registration acceptance test.

Round-1 verdict: the old pipeline regression test ("must not be worse")
could never fail.  This one injects genuine PER-SLICE motion into the
simulated stacks — stack-level registration cannot undo it, so the
reconstruction with the slice-to-volume pass MUST beat the
no-registration run by a hard PSNR margin (mirrors what
registerMultipleSlicesToVolume, reconstruction_cuda2.cu:4001, and the
default CPU SliceToVolumeRegistration, irtkReconstructionGPU.cc:2291,
are for).

Round-3 scenario redesign (tools/diag_s2v6.py / diag_s2v7.py): the
round-2 scenario (±2 mm / ±3°, noise 0.5, 2 mm in-plane, 6 mm thick,
1.6 mm recon) had an ORACLE ceiling — registration replaced by the true
injected transforms — of only 0.06 dB: PSF blur + noise dominated the
PSNR there, so the 1.0 dB bar was unreachable by ANY registration and
the test premise was invalid.  This scenario (±4 mm / ±5°, noise 0.25,
1.5 mm in-plane, 2.5 mm spacing, 1.25 mm recon) was tuned until motion
genuinely destroys reconstruction quality; measured on 2026-08-21:
no-reg 13.78 dB, oracle 14.69 dB (+0.91), registration 15.12 dB (+1.34 —
it also compensates residual forward-model mismatch the true transforms
leave behind, hence reg > oracle).
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
    gt = make_ground_truth(n=32, spacing=1.25)
    rng = np.random.default_rng(3)
    # per-slice jitter: +-5 deg rotations, +-4 mm translations on every
    # other slice — within the registration capture range (the default
    # CPU-preset step schedule starts at 8 mm/deg) but far beyond what
    # voxel-level robust statistics can absorb
    slice_motions = []
    nz = int(32 * 1.25 / 2.5)
    for s in range(2):
        m = np.zeros((nz, 6))
        m[::2, :3] = rng.uniform(-4.0, 4.0, (len(m[::2]), 3))
        m[::2, 3:] = rng.uniform(-5.0, 5.0, (len(m[::2]), 3))
        slice_motions.append(m)
    stacks, _ = simulate_stacks(gt, n_stacks=2, in_plane=1.5, dz=2.5,
                                noise=0.25, slice_motions=slice_motions)
    mask_img = Image((gt.data > 1.0).astype(np.float32), gt.attr.copy())

    base = dict(resolution=1.25, rec_iterations_first=3,
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
