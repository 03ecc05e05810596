"""Diagnose the end-to-end s2v registration failure (test_s2v_required).

Replicates the pipeline: simulate per-slice-jittered stacks, run run_svr
with an iteration hook that reports per-slice transform error vs the
injected motion and PSNR per iteration.
"""
import sys
import numpy as np

sys.path.insert(0, "/root/repo/tests")
import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
from phantom import make_ground_truth, simulate_stacks, psnr
from fetalreconstruction_tpu.core.image import Image
from fetalreconstruction_tpu.core.geometry import rigid_matrix
from fetalreconstruction_tpu.ops.sampling import resample_to_grid
from fetalreconstruction_tpu.pipeline.config import SVRConfig
from fetalreconstruction_tpu.pipeline.svr import run_svr

gt = make_ground_truth(n=28, spacing=1.5)
rng = np.random.default_rng(3)
slice_motions = []
for s in range(2):
    m = np.zeros((14, 6))
    m[::2, :3] = rng.uniform(-2.0, 2.0, (len(m[::2]), 3))
    m[::2, 3:] = rng.uniform(-3.0, 3.0, (len(m[::2]), 3))
    slice_motions.append(m)
stacks, _ = simulate_stacks(gt, n_stacks=2, in_plane=2.0, dz=3.0,
                            noise=0.5, slice_motions=slice_motions)
mask_img = Image((gt.data > 1.0).astype(np.float32), gt.attr.copy())

# true per-slice transforms, in slice order (stack 0 slices then stack 1)
nz = stacks[0].attr.z
true_t = []
for s in range(2):
    for i in range(nz):
        true_t.append(rigid_matrix(slice_motions[s][i]))
true_t = np.stack(true_t)


def _psnr_vs_gt(out):
    gt_on = np.asarray(resample_to_grid(
        jnp.asarray(gt.data), jnp.asarray(gt.attr.w2i(), jnp.float32),
        out.attr.shape_zyx, jnp.asarray(out.attr.i2w(), jnp.float32)))
    roi = (gt_on > 1.0) & (out.data > 0)
    return psnr(out.data[roi], gt_on[roi])


def report(tag, transforms):
    # translation part error + rotation error (Frobenius of R diff)
    t_err, r_err = [], []
    for i in range(min(len(transforms), len(true_t))):
        d = transforms[i] @ np.linalg.inv(true_t[i])
        t_err.append(np.linalg.norm(d[:3, 3]))
        r_err.append(np.linalg.norm(d[:3, :3] - np.eye(3)))
    print(f"{tag}: mean |t| err {np.mean(t_err):.3f} mm, "
          f"max {np.max(t_err):.3f}; mean |R| err {np.mean(r_err):.4f}, "
          f"max {np.max(r_err):.4f}")


base = dict(resolution=1.6, rec_iterations_first=3, rec_iterations_last=4,
            smooth_mask=2.0, multires_levels=1, reg_levels=2,
            reg_iterations=8)

hist = []


def hook(it, img, transforms=None):
    hist.append((it, _psnr_vs_gt(img)))
    print(f"iter {it}: PSNR {hist[-1][1]:.2f} dB")


print("=== with registration, 3 iterations ===")
res = run_svr(SVRConfig(iterations=3, **base), stacks=stacks,
              mask=mask_img, iteration_hook=hook)
report("final transforms", res.transforms)
print("final PSNR", _psnr_vs_gt(res.reconstructed))
report("identity (no-reg) baseline", np.tile(np.eye(4), (len(true_t), 1, 1)))
