"""test_s2v_required scenario with ORTHOGONAL stacks (axial + coronal),
the acquisition geometry the reference's example data actually has.
Reports no-reg vs reg PSNR and transform errors."""
import sys

import numpy as np

sys.path.insert(0, "/root/repo/tests")
sys.path.insert(0, "/root/repo")
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
                            noise=0.5, slice_motions=slice_motions,
                            orientations=[(0, 0, 0), (90, 0, 0)])
print("stack shapes:", [s.data.shape for s in stacks])
mask_img = Image((gt.data > 1.0).astype(np.float32), gt.attr.copy())


def _psnr_vs_gt(out):
    gt_on = np.asarray(resample_to_grid(
        jnp.asarray(gt.data), jnp.asarray(gt.attr.w2i(), jnp.float32),
        out.attr.shape_zyx, jnp.asarray(out.attr.i2w(), jnp.float32)))
    roi = (gt_on > 1.0) & (out.data > 0)
    print("roi frac", roi.mean())
    return psnr(out.data[roi], gt_on[roi])


base = dict(resolution=1.6, rec_iterations_first=3, rec_iterations_last=4,
            smooth_mask=2.0, multires_levels=1, reg_levels=2,
            reg_iterations=8)
res0 = run_svr(SVRConfig(iterations=1, **base), stacks=stacks,
               mask=mask_img)
p0 = _psnr_vs_gt(res0.reconstructed)
print(f"no-reg PSNR {p0:.2f}")
res1 = run_svr(SVRConfig(iterations=3, **base), stacks=stacks,
               mask=mask_img)
p1 = _psnr_vs_gt(res1.reconstructed)
print(f"reg PSNR {p1:.2f}  gain {p1 - p0:.2f} dB")

nz = stacks[0].attr.z
true_t = np.stack([rigid_matrix(slice_motions[s][i])
                   for s in range(2) for i in range(nz)])
t_err = [np.linalg.norm((res1.transforms[i] @ np.linalg.inv(true_t[i]))[:3, 3])
         for i in range(len(true_t))]
print(f"final mean |t| err {np.mean(t_err):.3f} mm (max {np.max(t_err):.3f})")
