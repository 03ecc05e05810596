"""Rotation-axis probe: sweep each rotation param around truth and print
the cost curve + central-difference gradient components at identity."""
import sys

import numpy as np

sys.path.insert(0, "/root/repo/tests")
sys.path.insert(0, "/root/repo")
import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
from phantom import make_ground_truth, simulate_stacks
from fetalreconstruction_tpu.core.geometry import rigid_matrix
from fetalreconstruction_tpu.ops.sampling import resample_to_grid
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

res = 1.6
ra = gt.attr.with_spacing(res, res, res)
recon = resample_to_grid(
    jnp.asarray(gt.data), jnp.asarray(gt.attr.w2i(), jnp.float32),
    ra.shape_zyx, jnp.asarray(ra.i2w(), jnp.float32), interp="linear",
    padding=0.0)
recon_w2i = jnp.asarray(ra.w2i(), jnp.float32)

targets, mo, ofs = prepare_registration_slices(batch, ra.dx)
targets_j = jnp.asarray(targets)
mo_j, ofs_j = jnp.asarray(mo), jnp.asarray(ofs)

cfg = s2v.SliceRegConfig(levels=2, iterations=8)
level = 0
sigma_pix = cfg.blur_sigmas(float(ra.dx))[level] / float(ra.dx)
tgt = s2v.reg_blur(targets_j, sigma_pix)
tgt_mean, _ = s2v._masked_mean(tgt)
cost = s2v.make_cost_fn(cfg, recon, recon_w2i, ofs_j, tgt, tgt_mean,
                        targets.shape[1:], level, sigma_pix)

p_true_all = np.asarray(s2v.matrix_to_params_jax(
    jnp.asarray(np.einsum("nij,njk->nik", true_t, mo), jnp.float32)))
p_id_all = np.asarray(s2v.matrix_to_params_jax(
    jnp.asarray(mo, jnp.float32)))

names = ["tx", "ty", "tz", "rx", "ry", "rz"]
for i in (6, 10):
    print(f"\n=== slice {i}  true-delta "
          f"{np.round(p_true_all[i] - p_id_all[i], 2)} ===")
    for pidx in (3, 4, 5):
        deltas = np.linspace(-4, 4, 17)
        cs = []
        for d in deltas:
            pa = p_true_all.copy()
            pa[i, pidx] += d
            cs.append(float(cost(jnp.asarray(pa, jnp.float32))[i]))
        am = deltas[int(np.argmax(cs))]
        print(f"  {names[pidx]} sweep around TRUTH: argmax at {am:+.1f} "
              f"(0 = truth)  curve "
              + " ".join(f"{c:.3f}" for c in cs))
    # gradient at identity, both step sizes
    for step in (0.1, 2.0):
        g = []
        for pidx in range(6):
            pa = p_id_all.copy(); pa[i, pidx] += step
            cp = float(cost(jnp.asarray(pa, jnp.float32))[i])
            pa = p_id_all.copy(); pa[i, pidx] -= step
            cm = float(cost(jnp.asarray(pa, jnp.float32))[i])
            g.append(cp - cm)
        g = np.asarray(g)
        gn = g / max(np.linalg.norm(g), 1e-12)
        print(f"  grad@id step {step}: "
              + " ".join(f"{names[k]}={gn[k]:+.3f}" for k in range(6)))
        want = p_true_all[i] - p_id_all[i]
        wantn = want / np.linalg.norm(want)
        print(f"  cos(grad, truth-dir) = {float(gn @ wantn):+.3f}")
