"""Oracle upper bound: run the exact test_s2v_required scenario but with
slice-to-volume registration replaced by the TRUE injected transforms.
The PSNR gain of this run is the ceiling any registration can reach."""
import sys

import numpy as np

sys.path.insert(0, "/root/repo/tests")
sys.path.insert(0, "/root/repo")
import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
from phantom import make_ground_truth, simulate_stacks, psnr
from fetalreconstruction_tpu.core.geometry import rigid_matrix
from fetalreconstruction_tpu.core.image import Image
from fetalreconstruction_tpu.ops.sampling import resample_to_grid
from fetalreconstruction_tpu.pipeline.config import SVRConfig
from fetalreconstruction_tpu.pipeline import svr as svr_mod
from fetalreconstruction_tpu.register import slice2vol as s2v

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
nz = stacks[0].attr.z
true_t = np.stack([rigid_matrix(slice_motions[s][i])
                   for s in range(2) for i in range(nz)])


def _psnr_vs_gt(out):
    gt_on = np.asarray(resample_to_grid(
        jnp.asarray(gt.data), jnp.asarray(gt.attr.w2i(), jnp.float32),
        out.attr.shape_zyx, jnp.asarray(out.attr.i2w(), jnp.float32)))
    roi = (gt_on > 1.0) & (out.data > 0)
    return psnr(out.data[roi], gt_on[roi])


base = dict(resolution=1.6, rec_iterations_first=3, rec_iterations_last=4,
            smooth_mask=2.0, multires_levels=1, reg_levels=2,
            reg_iterations=8)

res_noreg = svr_mod.run_svr(SVRConfig(iterations=1, **base), stacks=stacks,
                            mask=mask_img)
p0 = _psnr_vs_gt(res_noreg.reconstructed)
print(f"no-reg PSNR {p0:.3f}")

# oracle: monkeypatch registration to return the true transforms
orig = svr_mod.s2v.register_slices_to_volume


def oracle_reg(cfg, recon, recon_w2i, transforms, mo, ofs, targets,
               recon_dx):
    n = transforms.shape[0]
    t = jnp.asarray(true_t[:n], jnp.float32)
    return t, jnp.zeros((n,), jnp.float32)


svr_mod.s2v.register_slices_to_volume = oracle_reg
try:
    res_oracle = svr_mod.run_svr(SVRConfig(iterations=3, **base),
                                 stacks=stacks, mask=mask_img)
finally:
    svr_mod.s2v.register_slices_to_volume = orig
p_or = _psnr_vs_gt(res_oracle.reconstructed)
print(f"oracle PSNR {p_or:.3f}  (ceiling gain {p_or - p0:.2f} dB; "
      f"test requires >= 1.0)")

# for comparison: the current registration result
res_reg = svr_mod.run_svr(SVRConfig(iterations=3, **base), stacks=stacks,
                          mask=mask_img)
p1 = _psnr_vs_gt(res_reg.reconstructed)
print(f"current reg PSNR {p1:.3f}  (gain {p1 - p0:.2f} dB)")
