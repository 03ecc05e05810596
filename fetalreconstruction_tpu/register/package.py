"""Package splitting + package-to-volume hierarchical motion estimation.

Reimplements the reference's hierarchical motion model
(irtkReconstructionGPU.cc):
- SplitImage (:4980): interleaved z-subsampling of a stack into `packages`
  sub-stacks (slice k of package l = stack slice k*packages + l), with
  pkg_dz = dz * packages and the origin shifted so slice 0 of the package
  lands exactly on stack slice l;
- SplitImageEvenOdd (:5039), SplitImageEvenOddHalf (:5058),
  HalfImage (:5078);
- PackageToVolume (:5096): per package, rigid registration to the current
  reconstruction (GuessParameterSliceToVolume preset) with the ResetOrigin
  trick, then the result is copied to every member slice's transform.

The driving schedule (reconstruction.cc:835-866): iter 1 whole packages,
iter 2 even/odd, iter 3 even/odd+half, iter >= 4 deeper halving.
"""
from __future__ import annotations

from typing import List, Tuple

import numpy as np

from ..core.geometry import matrix_to_params, rigid_matrix
from ..core.image import Image
from .volume import VolRegConfig, register_volumes_batched


def split_image(image: Image, packages: int) -> List[Image]:
    a = image.attr
    pkg_z = a.z // packages
    pkg_dz = a.dz * packages
    out = []
    for l in range(packages):
        nz = pkg_z + 1 if (pkg_z * packages + l) < a.z else pkg_z
        na = a.copy()
        na.z = nz
        na.dz = pkg_dz
        data = np.ascontiguousarray(
            image.data[l::packages][:nz])
        stack = Image(data, na)
        # origin adjustment: world position of package voxel (0,0,0) must
        # equal world position of stack voxel (0,0,l)
        want = image.attr.image_to_world([0.0, 0.0, float(l)])
        have = stack.attr.image_to_world([0.0, 0.0, 0.0])
        na.xorigin += float(want[0] - have[0])
        na.yorigin += float(want[1] - have[1])
        na.zorigin += float(want[2] - have[2])
        out.append(Image(data, na))
    return out


def split_image_even_odd(image: Image, packages: int) -> List[Image]:
    out = []
    for pack in split_image(image, packages):
        out.extend(split_image(pack, 2))
    return out


def half_image(image: Image) -> List[Image]:
    a = image.attr
    if a.z >= 4:
        return [image.get_region(0, 0, 0, a.x, a.y, a.z // 2),
                image.get_region(0, 0, a.z // 2, a.x, a.y, a.z)]
    return [image]


def split_image_even_odd_half(image: Image, packages: int,
                              iterations: int) -> List[Image]:
    if iterations > 1:
        packs = split_image_even_odd_half(image, packages, iterations - 1)
    else:
        packs = split_image_even_odd(image, packages)
    out = []
    for p in packs:
        out.extend(half_image(p))
    return out


def package_to_volume(stacks: List[Image], pack_num: List[int],
                      reconstructed: Image,
                      transforms: np.ndarray,
                      evenodd: bool = False, half: bool = False,
                      half_iter: int = 1, use_nmi: bool = False,
                      cfg: VolRegConfig = None) -> np.ndarray:
    """Hierarchical package registration; updates and returns the (N,4,4)
    per-slice transform array (slices ordered stack-major like
    CreateSlicesAndTransformations)."""
    if cfg is None:
        cfg = VolRegConfig(metric="nmi" if use_nmi else "cc",
                           source_iso=True)
    transforms = np.array(transforms, dtype=np.float64, copy=True)
    # collect EVERY package of EVERY stack, then register them as one
    # lock-step batch against the shared reconstruction (the reference
    # fans these out over threads, irtkReconstructionGPU.cc:5096-5190;
    # here all packages of an iteration advance through the same jitted
    # sweeps — the source volume is broadcast, not copied)
    all_pkgs: List[Image] = []
    all_members: List[List[int]] = []
    inits: List[np.ndarray] = []
    first_slice = 0
    for i, stack in enumerate(stacks):
        if evenodd:
            if half:
                packages = split_image_even_odd_half(stack, pack_num[i],
                                                     half_iter)
            else:
                packages = split_image_even_odd(stack, pack_num[i])
        else:
            packages = split_image(stack, pack_num[i])

        for pkg in packages:
            # member slice indices of the package within the batch
            members = []
            for k in range(pkg.attr.z):
                wk = pkg.attr.image_to_world([0.0, 0.0, float(k)])
                zk = stack.attr.world_to_image(wk)[2]
                members.append(int(round(zk)) + first_slice)
            all_pkgs.append(pkg)
            all_members.append(members)
            inits.append(transforms[members[0]])
        first_slice += stack.attr.z

    if not all_pkgs:
        return transforms
    mats, _ = register_volumes_batched(
        cfg, all_pkgs, [reconstructed] * len(all_pkgs),
        init_matrices=np.stack(inits))
    for t_new, members in zip(mats, all_members):
        for idx in members:
            transforms[idx] = t_new
    return transforms
