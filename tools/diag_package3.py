"""Package-registration cost landscape: is the optimizer stalling or is
the cost surface wrong?

For ONE moved package (interleaved, dz doubled) vs the TRUE template:
  - per-package recovered error (moved vs anchor packages separately)
  - CC cost along the identity -> true-motion line (the cost MUST rise
    monotonically toward truth if the surface is sound)
  - per-DOF cost curves around truth

Run: JAX_PLATFORMS=cpu python tools/diag_package3.py
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
from fetalreconstruction_tpu.register.package import split_image
from fetalreconstruction_tpu.register.volume import (
    VolRegConfig, register_volumes, _pyramid_level, _vol_cost_jit,
    guess_padding)
from fetalreconstruction_tpu.register.slice2vol import matrix_to_params_jax

from diag_package import build


def main():
    gt, stacks, mask_img, slice_motions = build()
    recon = Image(gt.data, gt.attr.copy())

    for s, st in enumerate(stacks):
        packs = split_image(st, 2)
        t_true = rigid_matrix(slice_motions[s][1])  # package-1 motion
        for l, pkg in enumerate(packs):
            want = np.eye(4) if l == 0 else t_true
            cfg = VolRegConfig(metric="cc", source_iso=True)
            t_est, sim = register_volumes(cfg, pkg, recon)
            derr = np.linalg.norm(
                (np.linalg.inv(want) @ t_est - np.eye(4))[:3, 3])
            rerr = np.rad2deg(np.arccos(np.clip(
                (np.trace((np.linalg.inv(want) @ t_est)[:3, :3]) - 1) / 2,
                -1, 1)))
            print(f"stack {s} pkg {l}: |dt|={derr:5.2f} mm "
                  f"rot={rerr:5.2f} deg  sim={sim:.4f}")

    # does a gd polish (mixed-direction line search) escape the coord
    # local optimum?  coord accepts only per-DOF moves; a rotation error
    # with compensating translation needs a COUPLED move to fix.
    from fetalreconstruction_tpu.register.optimizer import OptimizerConfig
    from fetalreconstruction_tpu.register import volume as vol_mod
    import fetalreconstruction_tpu.register.volume as V

    orig_sweeps = {}

    def hybrid_register(cfg, tgt, src):
        return register_volumes(cfg, tgt, src)

    for s, st in enumerate(stacks):
        packs = split_image(st, 2)
        t_true = rigid_matrix(slice_motions[s][1])
        for l, pkg in enumerate(packs):
            want = np.eye(4) if l == 0 else t_true
            cfg = VolRegConfig(metric="cc", source_iso=True,
                               optimizer="coord+gd")
            t_est, sim = register_volumes(cfg, pkg, recon)
            derr = np.linalg.norm(
                (np.linalg.inv(want) @ t_est - np.eye(4))[:3, 3])
            rerr = np.rad2deg(np.arccos(np.clip(
                (np.trace((np.linalg.inv(want) @ t_est)[:3, :3]) - 1) / 2,
                -1, 1)))
            print(f"HYBRID stack {s} pkg {l}: |dt|={derr:5.2f} mm "
                  f"rot={rerr:5.2f} deg  sim={sim:.4f}")

    # cost landscape for stack 0 package 1 at pyramid level 0
    st = stacks[0]
    pkg = split_image(st, 2)[1]
    t_true = rigid_matrix(slice_motions[0][1])
    cfg = VolRegConfig(metric="cc", source_iso=True)
    tp = guess_padding(pkg.data)
    sp = guess_padding(recon.data)
    # ResetOrigin as register_volumes does
    a = pkg.attr.copy()
    mo = np.eye(4)
    mo[:3, 3] = [a.xorigin, a.yorigin, a.zorigin]
    a.xorigin = a.yorigin = a.zorigin = 0.0
    pkg0 = Image(pkg.data, a)
    p_true = matrix_to_params_jax(
        jnp.asarray((t_true @ mo)[None], jnp.float32))
    p_id = matrix_to_params_jax(jnp.asarray(mo[None], jnp.float32))
    for level in (1, 0):
        tl = _pyramid_level(pkg0, level, tp, cfg.blur_z)
        sl = _pyramid_level(recon, level, sp, cfg.blur_z,
                            iso=cfg.source_iso)
        ti = jnp.asarray(tl.attr.i2w(), jnp.float32)
        sw = jnp.asarray(sl.attr.w2i(), jnp.float32)
        td, sd = jnp.asarray(tl.data), jnp.asarray(sl.data)
        line = []
        for alpha in np.linspace(-0.25, 1.25, 13):
            p = p_id + alpha * (p_true - p_id)
            c = _vol_cost_jit("cc", 64, td, sd, ti, sw,
                              jnp.float32(tp), jnp.float32(sp), p)
            line.append(float(c[0]))
        print(f"level {level} cost line id->true: "
              + " ".join(f"{v:.4f}" for v in line))


if __name__ == "__main__":
    main()
