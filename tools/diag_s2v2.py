"""Isolate the s2v pipeline failure: register the PIPELINE-prepared
targets against the TRUE volume (GT resampled to the recon grid).

If transforms recover the injected motion here, the registration+prepare
conventions are right and the end-to-end failure is template quality /
scheduling; if they do not, the bug is in prepare_registration_slices or
the transform composition."""
import sys

import numpy as np

sys.path.insert(0, "/root/repo/tests")
sys.path.insert(0, "/root/repo")
import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
from phantom import make_ground_truth, simulate_stacks
from fetalreconstruction_tpu.core.image import Image
from fetalreconstruction_tpu.core.geometry import rigid_matrix
from fetalreconstruction_tpu.ops.sampling import resample_to_grid
from fetalreconstruction_tpu.pipeline.config import SVRConfig
from fetalreconstruction_tpu.pipeline.state import create_slices
from fetalreconstruction_tpu.register import slice2vol as s2v
from fetalreconstruction_tpu.register.prepare import \
    prepare_registration_slices

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

batch = create_slices(stacks, [6.0] * len(stacks))
n = batch.n_slices
nz = stacks[0].attr.z
true_t = np.stack([rigid_matrix(slice_motions[s][i])
                   for s in range(2) for i in range(nz)])

# recon grid at 1.6 mm matching the test
res = 1.6
ra = gt.attr.with_spacing(res, res, res)
recon = resample_to_grid(
    jnp.asarray(gt.data), jnp.asarray(gt.attr.w2i(), jnp.float32),
    ra.shape_zyx, jnp.asarray(ra.i2w(), jnp.float32), interp="linear",
    padding=0.0)
recon_w2i = jnp.asarray(ra.w2i(), jnp.float32)

targets, mo, ofs = prepare_registration_slices(batch, ra.dx)
reg_cfg = s2v.SliceRegConfig(levels=2, iterations=8)
t0 = jnp.tile(jnp.eye(4, dtype=jnp.float32), (n, 1, 1))


def report(tag, transforms):
    t_err, r_err = [], []
    for i in range(n):
        d = np.asarray(transforms[i]) @ np.linalg.inv(true_t[i])
        t_err.append(np.linalg.norm(d[:3, 3]))
        r_err.append(np.linalg.norm(d[:3, :3] - np.eye(3)))
    print(f"{tag}: mean |t| {np.mean(t_err):.3f} mm (max {np.max(t_err):.3f})"
          f"  mean |R| {np.mean(r_err):.4f} (max {np.max(r_err):.4f})")


report("start (identity)", np.asarray(t0))
new_t, sim = s2v.register_slices_to_volume(
    reg_cfg, recon, recon_w2i, t0, jnp.asarray(mo), jnp.asarray(ofs),
    jnp.asarray(targets), ra.dx)
report("after s2v vs GT volume", np.asarray(new_t))
print("mean similarity", float(jnp.mean(sim)))

# second pass from the recovered transforms (as the pipeline would)
new_t2, sim2 = s2v.register_slices_to_volume(
    reg_cfg, recon, recon_w2i, new_t, jnp.asarray(mo), jnp.asarray(ofs),
    jnp.asarray(targets), ra.dx)
report("after 2nd s2v pass", np.asarray(new_t2))
print("mean similarity", float(jnp.mean(sim2)))
