"""Round-5 scenario design for the package-hierarchy acceptance test.

The reference's answer to COHERENT (all-slices) motion is the package
hierarchy (-p, reconstruction.cc:835-866): packages are the interleaved
acquisition passes (split_image: package l = stack slices l::packages),
and motion BETWEEN passes moves whole packages rigidly.  s2v cannot
bootstrap that regime (round-4 finding, tools/README.md) — package
registration can, because each package is a coherent 3D object.

Measures, on 2 orthogonal stacks with per-PACKAGE rigid motion
(packages=2: even slices identity / odd slices one shared transform per
stack):
    no-reg   s2v-only   packages(-p 2 2)   oracle(true transforms)
PSNRs that calibrate the acceptance bar in tests/test_package_motion.py.

Run: JAX_PLATFORMS=cpu python tools/diag_package.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__))), "tests"))

import numpy as np
import jax.numpy as jnp

from fetalreconstruction_tpu.core.geometry import rigid_matrix
from fetalreconstruction_tpu.core.image import Image
from fetalreconstruction_tpu.ops.sampling import resample_to_grid
from fetalreconstruction_tpu.pipeline.config import SVRConfig
from fetalreconstruction_tpu.pipeline import svr as svr_mod

from phantom import make_ground_truth, simulate_stacks, psnr, \
    make_stack_attr


def _psnr_vs_gt(gt, out):
    gt_on = np.asarray(resample_to_grid(
        jnp.asarray(gt.data), jnp.asarray(gt.attr.w2i(), jnp.float32),
        out.attr.shape_zyx, jnp.asarray(out.attr.i2w(), jnp.float32)))
    roi = (gt_on > 1.0) & (out.data > 0)
    return psnr(out.data[roi], gt_on[roi])


def make_textured_gt(n=32, spacing=1.25, seed=7):
    """Finer-textured asymmetric GT than phantom.make_ground_truth: the
    package-resolution CC surface of the smooth phantom admits
    equal-similarity optima rotated 4-12 deg off truth (diag_package3
    round-5 measurement) — clinical anatomy has the sharp asymmetric
    structure that pins rotation, so the scenario must too."""
    from fetalreconstruction_tpu.core.geometry import ImageAttributes
    a = ImageAttributes(x=n, y=n, z=n, dx=spacing, dy=spacing, dz=spacing)
    lin = np.linspace(-1, 1, n)
    z, y, x = np.meshgrid(lin, lin, lin, indexing="ij")
    r = np.sqrt(x ** 2 + 1.2 * y ** 2 + 1.1 * z ** 2)
    tex = (60.0 + 25.0 * np.cos(7 * np.pi * r)
           + 20.0 * np.sin(6.0 * x + 9.5 * y - 7.5 * z)
           + 15.0 * np.sin(11.0 * x * y + 8.0 * z)
           + 15.0 * np.cos(9.0 * y * z - 7.0 * x))
    vol = np.where(r < 0.85, np.maximum(tex, 1.0), 0.0).astype(np.float32)
    return Image(vol, a)


def build(seed=3, mt=3.0, mr=4.0):
    orientations = [[0, 0, 0], [90, 0, 0]]
    gt = make_textured_gt(n=32, spacing=1.25)
    rng = np.random.default_rng(seed)
    slice_motions = []
    pkg_motions = []
    for s in range(2):
        a = make_stack_attr(gt, orientations[s], 1.5, 2.5)
        m = np.zeros((a.z, 6))
        # package 1 (odd interleave) moves coherently; package 0 anchors
        pm = np.concatenate([rng.uniform(-mt, mt, 3),
                             rng.uniform(-mr, mr, 3)])
        m[1::2] = pm
        pkg_motions.append(pm)
        slice_motions.append(m)
    stacks, _ = simulate_stacks(gt, n_stacks=2, in_plane=1.5, dz=2.5,
                                noise=0.25, slice_motions=slice_motions,
                                orientations=orientations)
    mask_img = Image((gt.data > 1.0).astype(np.float32), gt.attr.copy())
    return gt, stacks, mask_img, slice_motions


def main():
    gt, stacks, mask_img, slice_motions = build()
    base = dict(resolution=1.25, rec_iterations_first=3,
                rec_iterations_last=4, smooth_mask=2.0,
                reg_levels=2, reg_iterations=8)

    def run(tag, **kw):
        cfg = SVRConfig(**{**base, **kw})
        out = svr_mod.run_svr(cfg, stacks=[Image(s.data.copy(),
                                                 s.attr.copy())
                                           for s in stacks],
                              mask=mask_img).reconstructed
        p = _psnr_vs_gt(gt, out)
        print(f"{tag:28s} {p:6.2f} dB")
        return p

    run("no-reg (1 iter)", iterations=1, multires_levels=1)
    run("s2v only (4 iters)", iterations=4, multires_levels=1)
    run("packages -p 2 2 (4 iters)", iterations=4, multires_levels=3,
        packages=[2, 2])

    # oracle: registration replaced by the true injected transforms
    orig_o = []
    for st in stacks:
        a = st.attr
        zax = np.asarray(a.zaxis, np.float64)
        c = np.asarray([a.xorigin, a.yorigin, a.zorigin], np.float64)
        orig_o.append(np.stack(
            [c + (j - (a.z - 1) / 2.0) * a.dz * zax for j in range(a.z)]))
    captured = {}
    orig_create = svr_mod.create_slices

    def capture_create(stks, thickness, **kw):
        b = orig_create(stks, thickness, **kw)
        captured["batch"] = b
        return b

    orig_reg = svr_mod.s2v.register_slices_to_volume

    def oracle_reg(cfg, recon, recon_w2i, transforms, mo, ofs, targets,
                   recon_dx, **kw):
        b = captured["batch"]
        n = transforms.shape[0]
        out = np.tile(np.eye(4, dtype=np.float32), (n, 1, 1))
        for idx in range(min(n, b.n_slices)):
            s = int(b.stack_index[idx])
            a = b.attrs[idx]
            o = np.asarray([a.xorigin, a.yorigin, a.zorigin], np.float64)
            j = int(np.argmin(np.linalg.norm(orig_o[s] - o, axis=1)))
            out[idx] = rigid_matrix(slice_motions[s][j])
        return jnp.asarray(out), jnp.zeros((n,), jnp.float32)

    svr_mod.create_slices = capture_create
    svr_mod.s2v.register_slices_to_volume = oracle_reg
    try:
        run("oracle (4 iters)", iterations=4, multires_levels=1)
    finally:
        svr_mod.s2v.register_slices_to_volume = orig_reg
        svr_mod.create_slices = orig_create


if __name__ == "__main__":
    main()
