"""Why doesn't package registration recover package motion?

Isolates package_to_volume from the pipeline: the diag_package scenario
(2 orthogonal stacks, package-1 slices share one rigid motion) is
registered against the TRUE ground-truth volume — a perfect template.
If recovery fails here the defect is in the 3D-3D optimizer/conventions,
not in template bootstrap.

Variants:
  A. package_to_volume as-is (coord_sweep with the s2v through-plane
     gates)
  B. gates disabled (monkeypatched coord_sweep: flat epsilon, no
     directional-contrast gate) — the gates were tuned for THICK-SLICE
     s2v cost surfaces; a package is a 3D object where tz/rx/ry are
     fully observable.

Run: JAX_PLATFORMS=cpu python tools/diag_package2.py
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
from fetalreconstruction_tpu.register import package as pkg_mod
from fetalreconstruction_tpu.register import optimizer as opt_mod

from diag_package import build


def _err(t_est, t_true, gt):
    pts = np.argwhere(gt.data > 1.0)[:, ::-1].astype(np.float64)
    w = gt.attr.image_to_world(pts)
    d = (w @ (np.linalg.inv(t_true) @ t_est)[:3, :3].T
         + (np.linalg.inv(t_true) @ t_est)[:3, 3]) - w
    return float(np.mean(np.linalg.norm(d, axis=1)))


def run_variant(tag, gt, stacks, slice_motions):
    n = sum(s.attr.z for s in stacks)
    transforms = np.tile(np.eye(4), (n, 1, 1))
    out = pkg_mod.package_to_volume(stacks, [2, 2],
                                    Image(gt.data, gt.attr.copy()),
                                    transforms)
    first = 0
    errs0, errs1 = [], []
    for s, st in enumerate(stacks):
        for j in range(st.attr.z):
            t_true = rigid_matrix(slice_motions[s][j])
            errs0.append(_err(np.eye(4), t_true, gt))
            errs1.append(_err(out[first + j], t_true, gt))
        first += st.attr.z
    print(f"{tag:32s} mean displacement error "
          f"{np.mean(errs0):.2f} -> {np.mean(errs1):.2f} mm")


def main():
    gt, stacks, mask_img, slice_motions = build()

    run_variant("A: default gates", gt, stacks, slice_motions)

    # B: flat-threshold coord sweep (no through-plane stiffening, no
    # directional-contrast gate)
    orig = opt_mod.coord_sweep

    def flat_sweep(cost, params, active, best, step_size, epsilon):
        eye6 = jnp.eye(6, dtype=params.dtype)
        improved = jnp.zeros(params.shape[:1], bool)
        eps = epsilon * jnp.maximum(step_size, 1.0)
        for p in range(6):
            delta = step_size * eye6[p][None, :]
            cp = cost(params + delta)
            cm = cost(params - delta)
            take_p = active & (cp > best + eps) & (cp >= cm)
            take_m = active & (cm > best + eps) & ~take_p
            sign = (take_p.astype(params.dtype)
                    - take_m.astype(params.dtype))
            params = params + delta * sign[:, None]
            best = jnp.where(take_p, cp, jnp.where(take_m, cm, best))
            improved = improved | take_p | take_m
        return params, active & improved, best

    opt_mod.coord_sweep = flat_sweep
    # the jitted sweeps captured coord_sweep at import; clear caches
    from fetalreconstruction_tpu.register import volume as vol_mod
    vol_mod._vol_sweep_b_jit.clear_cache()
    try:
        run_variant("B: flat sweep (no gates)", gt, stacks, slice_motions)
    finally:
        opt_mod.coord_sweep = orig
        vol_mod._vol_sweep_b_jit.clear_cache()


if __name__ == "__main__":
    main()
