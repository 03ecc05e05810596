"""NumPy oracle for the PSF projection ops.

Direct (unfactorized) transcription of the math in the reference CUDA
kernels gaussianReconstructionKernel3D_tex / simulateSlicesKernel3D_tex /
SuperresolutionKernel3D_tex (reconstruction_cuda2.cu:112-520): per slice
pixel, loop the offset cube, map each integer volume voxel back through the
full affine combInvTrans and evaluate calcPSF.  Used to validate the
production engine's frac-factorized formulation, which must agree to
float tolerance.
"""
import numpy as np

PSF_CONST = 2.3548


def calc_psf_np(mm, dim):
    sigz = dim[2] / PSF_CONST
    ax = mm[..., 0] * dim[0] / PSF_CONST
    ay = mm[..., 1] * dim[1] / PSF_CONST
    r = np.pi * np.sqrt(ax * ax + ay * ay)
    si = np.where(r > 1e-6, np.sin(np.maximum(r, 1e-12)) / np.maximum(r, 1e-12), 1.0)
    return si * si * np.exp(-(mm[..., 2] ** 2) / (2 * sigz * sigz))


def oracle_all(slices, fwd, slice_dim, vol, mask, offsets):
    """Compute (sume, recon_num, recon_wts, sim, simw, inside) the slow way.

    slices: (N,H,W) with -1 padding (already bias/scale-corrected values for
    the scatter payload); fwd: (N,4,4); vol/mask: [z,y,x].
    """
    n, h, w = slices.shape
    zs, ys, xs = vol.shape
    sume = np.zeros((n, h, w))
    recon = np.zeros_like(vol, dtype=np.float64)
    wts = np.zeros_like(vol, dtype=np.float64)
    sim = np.zeros((n, h, w))
    simw = np.zeros((n, h, w))
    inside = np.zeros((n, h, w), bool)
    for s in range(n):
        inv = np.linalg.inv(fwd[s])
        dim = slice_dim[s]
        for j in range(h):
            for i in range(w):
                if slices[s, j, i] == -1.0:
                    continue
                p = np.array([i, j, 0, 1.0])
                vp = fwd[s] @ p
                c = np.floor(vp[:3] + 0.5)
                # pass 1: sume over in-bounds
                acc = 0.0
                for o in offsets:
                    vox = c + o
                    if not (0 <= vox[0] < xs and 0 <= vox[1] < ys
                            and 0 <= vox[2] < zs):
                        continue
                    sc = inv @ np.append(vox, 1.0)
                    mm = (sc[:3] - p[:3]) * dim
                    acc += calc_psf_np(mm[None, :], dim)[0]
                if acc <= 0.5:
                    continue
                sume[s, j, i] = acc
                # pass 2: scatter + gather over in-bounds AND mask
                num = 0.0
                den = 0.0
                for o in offsets:
                    vox = (c + o).astype(int)
                    if not (0 <= vox[0] < xs and 0 <= vox[1] < ys
                            and 0 <= vox[2] < zs):
                        continue
                    if mask[vox[2], vox[1], vox[0]] == 0:
                        continue
                    sc = inv @ np.append(vox.astype(float), 1.0)
                    mm = (sc[:3] - p[:3]) * dim
                    pw = calc_psf_np(mm[None, :], dim)[0] / acc
                    recon[vox[2], vox[1], vox[0]] += pw * slices[s, j, i]
                    wts[vox[2], vox[1], vox[0]] += pw
                    num += pw * vol[vox[2], vox[1], vox[0]]
                    den += pw
                if den > 0:
                    sim[s, j, i] = num / den
                    simw[s, j, i] = den
                    inside[s, j, i] = True
    return sume, recon, wts, sim, simw, inside
