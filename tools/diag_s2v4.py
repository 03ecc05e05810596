"""Cost landscape probe: is the NCC cost peaked at the TRUE per-slice
motion when registering pipeline-prepared targets against the GT volume?

If the cost peaks at truth but the optimizer doesn't get there -> optimizer
bug (step/epsilon/schedule).  If the cost does NOT peak at truth -> a
convention mismatch somewhere in prepare/generate (target and generated
slices disagree about geometry)."""
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
true_p = np.stack([slice_motions[s][i]
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

# pick moved slices with decent content in the MIDDLE of the stack
valid_cnt = (targets > -1).sum(axis=(1, 2))
moved = np.array([np.linalg.norm(true_p[i]) > 0.5 for i in range(n)])
cand = [i for i in range(n) if moved[i] and valid_cnt[i] > 300]
print("candidate moved slices:", cand[:8])

p_id_all = np.asarray(s2v.matrix_to_params_jax(
    jnp.asarray(np.einsum("nij,njk->nik",
                          np.tile(np.eye(4), (n, 1, 1)), mo), jnp.float32)))
p_true_all = np.asarray(s2v.matrix_to_params_jax(
    jnp.asarray(np.einsum("nij,njk->nik", true_t, mo), jnp.float32)))

for i in cand[:4]:
    p_id, p_true = p_id_all[i], p_true_all[i]
    print(f"\nslice {i}: true motion params {np.round(true_p[i], 2)}")
    print(f"  params@identity {np.round(p_id, 2)}")
    print(f"  params@truth    {np.round(p_true, 2)}")
    alphas = np.linspace(-0.5, 1.5, 21)
    cs = []
    for a in alphas:
        pa = p_id_all.copy()
        pa[i] = p_id + a * (p_true - p_id)
        cs.append(float(cost(jnp.asarray(pa, jnp.float32))[i]))
    cs = np.asarray(cs)
    best = alphas[int(np.argmax(cs))]
    print("  line id->truth costs:", " ".join(f"{c:.3f}" for c in cs))
    print(f"  argmax at alpha={best:.2f} (1.0=truth; "
          f"cost@id {cs[5]:.4f} cost@truth {cs[15]:.4f})")

# now run the actual optimizer at this single level and report where it goes
print("\n--- optimize_level from identity at level 0 ---")
from fetalreconstruction_tpu.register.optimizer import (OptimizerConfig,
                                                        optimize_level)
ocfg = OptimizerConfig(steps=cfg.steps, iterations=cfg.iterations,
                       epsilon=cfg.epsilon,
                       max_linesearch=cfg.max_linesearch)
p_out, sim = optimize_level(ocfg, cost, jnp.asarray(p_id_all, jnp.float32),
                            cfg.step0)
p_out = np.asarray(p_out)
for i in cand[:4]:
    d_opt = np.linalg.norm(p_out[i] - p_true_all[i])
    d_id = np.linalg.norm(p_id_all[i] - p_true_all[i])
    print(f"slice {i}: |p-p_true| {d_id:.3f} -> {d_opt:.3f}  "
          f"sim {float(sim[i]):.4f}")

print("\n--- component-wise |p-p_true| after level-0 optimize ---")
for i in cand[:4]:
    d0 = p_id_all[i] - p_true_all[i]
    d1 = p_out[i] - p_true_all[i]
    print(f"slice {i}: id  {np.round(d0, 2)}")
    print(f"          opt {np.round(d1, 2)}")

print("\n--- full 2-level schedule, iterations=20 (reference default) ---")
cfg20 = s2v.SliceRegConfig(levels=2, iterations=20)
t0 = jnp.tile(jnp.eye(4, dtype=jnp.float32), (n, 1, 1))
new_t, sim = s2v.register_slices_to_volume(
    cfg20, recon, recon_w2i, t0, mo_j, ofs_j, targets_j, ra.dx)
p_new = np.asarray(s2v.matrix_to_params_jax(
    jnp.einsum("nij,njk->nik", new_t, mo_j)))
for i in cand[:6]:
    d0 = p_id_all[i] - p_true_all[i]
    d1 = p_new[i] - p_true_all[i]
    print(f"slice {i}: |inplane txy| {np.linalg.norm(d0[:2]):.2f} -> "
          f"{np.linalg.norm(d1[:2]):.2f}   |rot| "
          f"{np.linalg.norm(d0[3:]):.2f} -> {np.linalg.norm(d1[3:]):.2f}")
inp0 = [np.linalg.norm((p_id_all[i] - p_true_all[i])[:2]) for i in range(n)]
inp1 = [np.linalg.norm((p_new[i] - p_true_all[i])[:2]) for i in range(n)]
rot0 = [np.linalg.norm((p_id_all[i] - p_true_all[i])[3:]) for i in range(n)]
rot1 = [np.linalg.norm((p_new[i] - p_true_all[i])[3:]) for i in range(n)]
print(f"mean in-plane txy err {np.mean(inp0):.3f} -> {np.mean(inp1):.3f}")
print(f"mean rot err {np.mean(rot0):.3f} -> {np.mean(rot1):.3f}")

print("\n--- CPU-path hyperparams: levels=3, step0=2.0, iterations=20 ---")
cfg_cpu = s2v.SliceRegConfig(levels=3, iterations=20, step0=2.0)
new_t, sim = s2v.register_slices_to_volume(
    cfg_cpu, recon, recon_w2i, t0, mo_j, ofs_j, targets_j, ra.dx)
p_new = np.asarray(s2v.matrix_to_params_jax(
    jnp.einsum("nij,njk->nik", new_t, mo_j)))
inp1 = [np.linalg.norm((p_new[i] - p_true_all[i])[:2]) for i in range(n)]
rot1 = [np.linalg.norm((p_new[i] - p_true_all[i])[3:]) for i in range(n)]
rz1 = [abs((p_new[i] - p_true_all[i])[5]) for i in range(n)]
rz0 = [abs((p_id_all[i] - p_true_all[i])[5]) for i in range(n)]
print(f"mean in-plane txy err {np.mean(inp0):.3f} -> {np.mean(inp1):.3f}")
print(f"mean rot err {np.mean(rot0):.3f} -> {np.mean(rot1):.3f}")
print(f"mean in-plane rz err {np.mean(rz0):.3f} -> {np.mean(rz1):.3f}")
