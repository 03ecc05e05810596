"""Fast TPU PSF engine: per-stack separable convolution + trilinear sampling.

The exact engine (ops/psf.py) anchors the PSF at integer volume voxels
around round(F p) — a faithful transcription of the reference CUDA kernels,
but its transpose requires ~K^3 x n_pixels scatter-adds (6e9 for the
canonical run), which XLA TPU executes at only ~1e8 updates/s.  This module
is the TPU-native reformulation used for production runs:

    sim[p]  = (K_s * (vol . mask))(F_s p) / (K_s * mask)(F_s p)
    addon   = mask . (K_s * splat(payload / sume))
    sume[p] = (K_s * 1_volume)(F_s p)

where K_s is the PSF rasterized ON THE VOLUME GRID in the orientation of
stack s (K_s[o] = calcPSF(A3_s o . sliceDim)), `*` is volume convolution
(zero-padded), and sampling/splatting is trilinear at the CONTINUOUS
position F_s p.  This is algebraically the reference model with two
deliberate deviations (documented, validated against the exact engine in
tests):

1. continuous PSF anchoring instead of rounding to the nearest voxel
   (sub-voxel quantization removed — physically MORE correct);
2. one PSF orientation per STACK (the identity-motion A3 of its slices'
   common geometry) instead of per slice; per-slice motion still enters
   exactly through the sampling positions F_s p.  Slice-level rotations of
   a few degrees rotate the smooth PSF kernel negligibly.

K_s is decomposed into a sum of separable rank-1 triads (two-stage SVD,
energy cutoff), so each convolution is a handful of shift-multiply-add
passes on the VPU; the only scatter left is the 8-corner trilinear splat
(~28M updates for the canonical run) with addon/cmap sharing one index set
in a single stacked-f32 scatter.
"""
from __future__ import annotations

import os
from functools import partial
from typing import List, NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .psf import PSF_CONST, calc_psf


class FastGeom(NamedTuple):
    """Per-pixel continuous sampling geometry.

    xp:    (N, H, W, 3) f32  continuous volume position F_s p (x, y, z)
    valid: (N, H, W)   bool
    sume:  (N, H, W)   f32   PSF normalization (conv(1))(xp), 0-gated
    sid:   (N,)        i32   stack index per slice — selects the per-stack
           kernel/table; replaces the round-1 per-stack lo:hi slicing so
           the slice axis shards cleanly (every per-slice op is elementwise
           in sid; all per-STACK work is volume-space and replicated)
    den:   (N, H, W)   f32   cached (conv(mask))(xp) — mask AND xp are
           constant between geometry rebuilds, so the simulate
           denominator is gathered ONCE here instead of per call (round-4
           chip profile: the fused 16-row num+den gather cost 118 ms per
           simulate; caching den halves the per-call gather to the 8
           num rows, and replaces the round-3 (8, S*R) cmask table —
           ~0.5 GB at canonical shape — with an (N, H, W) per-slice
           array that also shards over the slice axis)
    plan:  optional pallas_scatter.ScatterPlan — the sorted-stream
           schedule for the Pallas TPU scatter kernel (None = XLA
           scatter).  Rebuilt with the geometry; all-array pytree.
    """
    xp: jax.Array
    valid: jax.Array
    sume: jax.Array
    sid: jax.Array
    den: jax.Array
    plan: object = None


def stack_kernel(a3: np.ndarray, slice_dim: np.ndarray,
                 support: int) -> np.ndarray:
    """Rasterize the PSF on the volume grid for one stack orientation.

    a3: (3,3) linear part of F^{-1} for the stack's identity-motion
    geometry; slice_dim: (3,).  Returns [z,y,x]-ordered (K,K,K) kernel.
    """
    centre = (support - 1) // 2
    r = np.arange(support) - centre
    oz, oy, ox = np.meshgrid(r, r, r, indexing="ij")
    o = np.stack([ox, oy, oz], axis=-1).astype(np.float64)  # (K,K,K,3)
    mm = np.einsum("ij,abcj->abci", a3, o) * slice_dim[None, None, None, :]
    k = np.asarray(calc_psf(jnp.asarray(mm, jnp.float32),
                            jnp.asarray(slice_dim, jnp.float32)))
    return k.astype(np.float32)


def separable_decompose(kernel: np.ndarray, tol: float = 1e-3,
                        max_terms: int = 8):
    """Decompose (K,K,K) kernel into rank-1 triads via two-stage SVD.

    Returns list of (kz, ky, kx, coeff) with
    kernel ~= sum coeff * kz x ky x kx.
    """
    kz, ky, kx = kernel.shape
    m1 = kernel.reshape(kz, ky * kx)
    u, s, vt = np.linalg.svd(m1, full_matrices=False)
    total = np.sqrt((s ** 2).sum())
    terms = []
    for i in range(len(s)):
        if s[i] < tol * total or len(terms) >= max_terms:
            break
        m2 = vt[i].reshape(ky, kx)
        u2, s2, vt2 = np.linalg.svd(m2, full_matrices=False)
        t2 = np.sqrt((s2 ** 2).sum())
        for j in range(len(s2)):
            if s2[j] < tol * t2 or len(terms) >= max_terms:
                break
            terms.append((u[:, i].astype(np.float32),
                          u2[:, j].astype(np.float32),
                          vt2[j].astype(np.float32),
                          float(s[i] * s2[j])))
    return terms


def _conv1d_axis(arr, taps: np.ndarray, axis: int):
    """Zero-padded 1D correlation: out[i] = sum_t taps[t] arr[i + t - r]."""
    k = len(taps)
    r = (k - 1) // 2
    n = arr.shape[axis]
    out = jnp.zeros_like(arr)
    for t in range(k):
        shift = t - r
        w = float(taps[t])
        if w == 0.0:
            continue
        lo = max(shift, 0)
        hi = min(n + shift, n)
        if hi <= lo:
            continue
        src = jax.lax.slice_in_dim(arr, lo, hi, axis=axis)
        pad = [(0, 0)] * arr.ndim
        pad[axis] = (lo - shift, n - (lo - shift) - (hi - lo))
        out = out + w * jnp.pad(src, pad)
    return out


def _conv1d_axis_adj(arr, taps: np.ndarray, axis: int):
    """Exact adjoint of _conv1d_axis: out[j] = sum_t taps[t] arr[j - t + r]."""
    k = len(taps)
    r = (k - 1) // 2
    n = arr.shape[axis]
    out = jnp.zeros_like(arr)
    for t in range(k):
        shift = r - t
        w = float(taps[t])
        if w == 0.0:
            continue
        lo = max(shift, 0)
        hi = min(n + shift, n)
        if hi <= lo:
            continue
        src = jax.lax.slice_in_dim(arr, lo, hi, axis=axis)
        pad = [(0, 0)] * arr.ndim
        pad[axis] = (lo - shift, n - (lo - shift) - (hi - lo))
        out = out + w * jnp.pad(src, pad)
    return out


_MXU_CONV = os.environ.get("FETALRECON_MXU_CONV", "1") != "0"


def _band_matrix(taps: np.ndarray, n: int, adjoint: bool = False):
    """(n, n) banded matrix form of the zero-padded 1-D tap pass:
    out = arr @ B applied along an axis of length n.

    Built by running the tap pass over the identity, so the even-size
    centre convention (tap (k-1)//2 is centre) is inherited exactly from
    _conv1d_axis/_conv1d_axis_adj; the taps are compile-time constants,
    so XLA folds the shifted-eye sum into a literal."""
    fn = _conv1d_axis_adj if adjoint else _conv1d_axis
    return fn(jnp.eye(n, dtype=jnp.float32), np.asarray(taps), 1)


def conv_separable(vol, terms, flip: bool = False):
    """Apply sum of separable triads to a (..., z, y, x) volume.

    The FULL kernel is centrally symmetric (psf(-mm) = psf(mm)) so the
    summed operator equals its own adjoint, but the individual SVD triads
    are not per-axis symmetric: the adjoint pass must use per-axis-flipped
    taps (flip=True), which reconstitutes the centrally-flipped == original
    kernel term-by-term consistently.

    NOTE on even support: with an even kernel size the tap at index
    (k-1)//2 is treated as centre, so flipping also shifts by one — both
    passes must agree on the convention, which flip=True provides.

    Default path: each 1-D pass is a dot against an (n, n) banded matrix
    — the MXU runs the whole pass as one matmul (measured v5e, canonical
    4-stack shape: 27.7 ms vs 80.9 ms for the VPU shift-add chain, rel
    err ~4e-7 at HIGHEST precision).  FETALRECON_MXU_CONV=0 restores the
    shift-add path."""
    if _MXU_CONV:
        hi = jax.lax.Precision.HIGHEST
        zs, ys, xs = vol.shape[-3:]
        out = jnp.zeros_like(vol)
        for kzv, kyv, kxv, c in terms:
            t = jnp.einsum("...x,xw->...w", vol,
                           _band_matrix(kxv, xs, flip), precision=hi)
            t = jnp.einsum("...yx,yw->...wx", t,
                           _band_matrix(kyv, ys, flip), precision=hi)
            t = jnp.einsum("...zyx,zw->...wyx", t,
                           _band_matrix(kzv, zs, flip), precision=hi)
            out = out + c * t
        return out
    out = jnp.zeros_like(vol)
    nd = vol.ndim
    for kzv, kyv, kxv, c in terms:
        if flip:
            t = _conv1d_axis_adj(vol, kxv, axis=nd - 1)
            t = _conv1d_axis_adj(t, kyv, axis=nd - 2)
            t = _conv1d_axis_adj(t, kzv, axis=nd - 3)
        else:
            t = _conv1d_axis(vol, kxv, axis=nd - 1)
            t = _conv1d_axis(t, kyv, axis=nd - 2)
            t = _conv1d_axis(t, kzv, axis=nd - 3)
        out = out + c * t
    return out


def make_shingle(vols):
    """Stack volumes into a CORNER-MAJOR shingled table for fast gathers.

    vols: sequence of P [z,y,x] arrays (same shape).  Returns
    (8*P, (zs+1)(ys+1)(xs+1)) f32: row p*8+c holds, flattened over the
    one-voxel-front-halo grid (position index = ((z+1)(ys+1) + y+1)
    (xs+1) + x+1, so floor index -1 is valid), corner c of volume p's
    2x2x2 window starting at that voxel; zero outside the volume.

    Corner-major keeps the minor dim large (zero (8,128) tiling padding
    — the former (R, 8P) layout lane-padded 8-16x) and one axis-1
    jnp.take fetches all 8P corner values per sample (round-3
    measurement: 91 ms vs 129 ms for the row-gather at the canonical
    simulate shape, with the table build cost dropping into the noise).
    """
    cols = []
    for vol in vols:
        for cw in (0, 1):
            for cv in (0, 1):
                for cu in (0, 1):
                    # window value at padded-row voxel (z,y,x) = vol[z+cw,
                    # y+cv, x+cu]; rows start at voxel -1 per axis.
                    sh = jnp.pad(vol, ((1 - cw, cw), (1 - cv, cv),
                                       (1 - cu, cu)))
                    cols.append(sh.reshape(-1))
    return jnp.stack(cols, axis=0)


def _corner_weights(xp):
    """floor indices + per-corner trilinear weights for (...,3) positions.

    Returns (ui, vi, wi, wts) with wts shaped (..., 8) ordered to match
    make_shingle's corner order ((cw, cv, cu) lexicographic).
    """
    x, y, z = xp[..., 0], xp[..., 1], xp[..., 2]
    u = jnp.floor(x); v = jnp.floor(y); w = jnp.floor(z)
    du = x - u; dv = y - v; dw = z - w
    wts = []
    for cw in (0, 1):
        for cv in (0, 1):
            for cu in (0, 1):
                wts.append((du if cu else 1 - du) * (dv if cv else 1 - dv)
                           * (dw if cw else 1 - dw))
    return (u.astype(jnp.int32), v.astype(jnp.int32), w.astype(jnp.int32),
            jnp.stack(wts, axis=-1))


def shingle_rows(vol_shape) -> int:
    """Rows per volume in a make_shingle table."""
    zs, ys, xs = vol_shape
    return (zs + 1) * (ys + 1) * (xs + 1)


def shingle_gather(shingle, xp, vol_shape, n_vols=1, sid=None):
    """Trilinear sample from a make_shingle table at (..., 3) (x,y,z).

    shingle: (8*n_vols, S*R) corner-major table (column-stacked per
    stack when sid is given — each sample reads column s*R + lin of its
    own stack's span).  Returns a tuple of n_vols arrays shaped
    xp.shape[:-1].  Exactly equivalent to per-corner masked takes
    (partial sums at the volume boundary included — the halo positions
    carry the correct mixed in/out-of-bounds windows).
    """
    zs, ys, xs = vol_shape
    R = shingle_rows(vol_shape)
    ui, vi, wi, wts = _corner_weights(xp)
    inb = ((ui >= -1) & (ui < xs) & (vi >= -1) & (vi < ys)
           & (wi >= -1) & (wi < zs))
    lin = ((wi + 1) * (ys + 1) + (vi + 1)) * (xs + 1) + (ui + 1)
    lin = jnp.clip(lin, 0, R - 1)
    if sid is not None:
        nd = lin.ndim - 1  # broadcast (N,) over the trailing (H, W) dims
        lin = lin + sid.astype(jnp.int32).reshape(
            sid.shape + (1,) * nd) * R
    cols = jnp.take(shingle, lin.reshape(-1), axis=1)  # (8*n_vols, Npix)
    outs = []
    for p in range(n_vols):
        acc = jnp.zeros(lin.shape, jnp.float32)
        for c in range(8):
            acc = acc + cols[8 * p + c].reshape(lin.shape) * wts[..., c]
        outs.append(jnp.where(inb, acc, 0.0))
    return tuple(outs)


def trilinear_gather(vol, xp):
    """Trilinear sample [z,y,x] volume at (..., 3) continuous (x,y,z);
    zero outside.  One-shot convenience wrapper over shingle_gather; hot
    callers build the shingle once and reuse it."""
    (out,) = shingle_gather(make_shingle([vol]), xp, vol.shape, 1)
    return out


def _splat2_blocked(xp, pay_a, pay_b, vol_shape, sid=None, n_stacks=1):
    """Parity-blocked width-16 scatter core; returns the blocked
    accumulator (n_stacks, 8, Bz, By, Bx, 2, 2, 2, 2).

    The volume is viewed, per corner parity s in {0,1}^3, as 2x2x2 blocks
    of the s-shifted volume V_s[j] = vol[j - s].  A pixel with floor index
    q (per axis) has q + s_q even for its own parity s_q = q & 1, so its
    full 2x2x2 corner window lands INSIDE block (q + s_q)/2 of V_{s_q}.
    All 8 trilinear corners x 2 payloads therefore form ONE 16-wide
    scatter row per pixel; the XLA TPU scatter cost is ~per-row (measured
    v5e: width-16 112 ns/row vs width-2 85 ns/row), so this runs ~8x
    fewer rows than the naive 8-corner scatter (measured: 0.46s vs 1.73s
    for 3.5M pixels into 160^3).

    sid: per-slice stack index -> rows offset by sid * 8*Bz*By*Bx, so all
    stacks accumulate in ONE scatter call (same total row count as the
    round-1 per-stack loop, but shardable over slices).
    """
    zs, ys, xs = vol_shape
    Bz, By, Bx = (zs + 3) // 2, (ys + 3) // 2, (xs + 3) // 2
    ui, vi, wi, wts = _corner_weights(xp)
    inb = ((ui >= -1) & (ui < xs) & (vi >= -1) & (vi < ys)
           & (wi >= -1) & (wi < zs))
    sx, sy, sz = ui & 1, vi & 1, wi & 1
    bx, by, bz = (ui + sx) >> 1, (vi + sy) >> 1, (wi + sz) >> 1
    par = (sz << 2) | (sy << 1) | sx
    row = ((par * Bz + bz) * By + by) * Bx + bx
    if sid is not None:
        nd = row.ndim - 1
        row = row + sid.astype(jnp.int32).reshape(
            sid.shape + (1,) * nd) * (8 * Bz * By * Bx)
    row = jnp.where(inb, row, -1).reshape(-1)
    # wts is ordered (cw, cv, cu); payload axis last -> (..., 8, 2)
    upd = jnp.stack([wts * pay_a[..., None], wts * pay_b[..., None]],
                    axis=-1).reshape(-1, 16)
    acc = jnp.zeros((n_stacks * 8 * Bz * By * Bx, 16), jnp.float32)
    acc = acc.at[row].add(upd, mode="drop")
    return acc.reshape(n_stacks, 8, Bz, By, Bx, 2, 2, 2, 2)


def _unblock2(acc, vol_shape):
    """Un-block one stack's parity accumulator (8,Bz,By,Bx,2,2,2,2) into
    two dense volumes: dense_s[2b+c] = blocks[b, c]; vol[i] += dense_s[i+s].
    Rows with floor outside [-1, dim-1] were dropped; boundary corners
    fall into halo positions of the dense views and are sliced away —
    exactly matching per-corner-masked scatter-add semantics."""
    zs, ys, xs = vol_shape
    Bz, By, Bx = acc.shape[1:4]
    out_a = jnp.zeros(vol_shape, jnp.float32)
    out_b = jnp.zeros(vol_shape, jnp.float32)
    for p in range(8):
        szp, syp, sxp = (p >> 2) & 1, (p >> 1) & 1, p & 1
        dense = acc[p].transpose(0, 3, 1, 4, 2, 5, 6).reshape(
            2 * Bz, 2 * By, 2 * Bx, 2)
        sl = dense[szp:szp + zs, syp:syp + ys, sxp:sxp + xs]
        out_a = out_a + sl[..., 0]
        out_b = out_b + sl[..., 1]
    return out_a, out_b


def trilinear_splat2(xp, pay_a, pay_b, vol_shape):
    """Adjoint of trilinear_gather (shingle_gather) for TWO payloads."""
    acc = _splat2_blocked(xp, pay_a, pay_b, vol_shape)
    return _unblock2(acc[0], vol_shape)


# ---------------------------------------------------------------------------
# engine construction
# ---------------------------------------------------------------------------

class FastPSF:
    """Per-run fast-engine state: per-stack separable kernels + slice
    grouping.  Host-side object; all members are static arrays/lists so the
    jitted functions close over them."""

    def __init__(self, stack_a3: np.ndarray, stack_dims: np.ndarray,
                 stack_slice_ranges: Sequence[Tuple[int, int]],
                 support: int, tol: float = 1e-3, pallas=None):
        self.support = support
        self.ranges = list(stack_slice_ranges)
        # Pallas TPU scatter kernel: DEFAULT ON for TPU backends since
        # round 3 — the update-major (16, L) stream layout fixed the
        # compile-time OOM of the first-cut kernel, and the production
        # bench measured 1.28 it/s vs 1.01 it/s for the XLA scatter path
        # on the canonical shape (BASELINE.md 2026-08-21; kernel core
        # 285 ms vs 422 ms XLA scatter).  FETALRECON_PALLAS=0 forces the
        # XLA path; CPU always uses XLA (the kernel would run in the slow
        # interpreter).
        if pallas is None:
            # TPU only: the Mosaic kernel (pltpu.PrefetchScalarGridSpec,
            # interpret=False) cannot lower on CUDA/ROCm; GPU and CPU
            # backends fall back to the XLA width-16 row scatter
            pallas = (os.environ.get("FETALRECON_PALLAS", "1") != "0"
                      and jax.default_backend() == "tpu")
        self.pallas = bool(pallas)
        self.terms = []
        for a3, dims in zip(stack_a3, stack_dims):
            k = stack_kernel(np.asarray(a3, np.float64),
                             np.asarray(dims, np.float64), support)
            self.terms.append(separable_decompose(k, tol))

    @classmethod
    def from_batch(cls, batch, recon_w2i: np.ndarray, support: int,
                   tol: float = 1e-3):
        """Build from a SliceBatch using each stack's identity-motion
        geometry (first slice of the stack)."""
        ranges = []
        a3s, dims = [], []
        idx = np.asarray(batch.stack_index)
        for s in np.unique(idx):
            members = np.nonzero(idx == s)[0]
            ranges.append((int(members[0]), int(members[-1]) + 1))
            fwd = np.asarray(recon_w2i) @ batch.i2w[members[0]]
            a3s.append(np.linalg.inv(fwd[:3, :3]))
            dims.append(batch.dims[members[0]])
        return cls(np.asarray(a3s), np.asarray(dims), ranges, support, tol)


def default_stack_id(fast: FastPSF, n: int) -> np.ndarray:
    """(n,) stack index from the FastPSF slice ranges; rows past the last
    range (mesh padding) inherit the last stack id."""
    sid = np.full((n,), len(fast.ranges) - 1, np.int32)
    for s, (lo, hi) in enumerate(fast.ranges):
        sid[lo:min(hi, n)] = s
    return sid


def make_fast_geom(fast: FastPSF, fwd, valid, vol_shape, mask=None,
                   stack_id=None):
    """Continuous per-pixel positions + sume (conv(1))(xp) + cached
    per-stack conv(mask) tables.

    fwd: (N,4,4) = reconW2I @ T_s @ sliceI2W; mask: [z,y,x] (ones if None);
    stack_id: (N,) i32 (derived from fast.ranges if omitted).  Every
    per-slice operation is elementwise in stack_id, so the slice axis
    shards over a mesh; the per-stack convolutions are volume-space and
    run replicated.
    """
    n, h, w = valid.shape
    if stack_id is None:
        stack_id = jnp.asarray(default_stack_id(fast, n))
    sid = jnp.asarray(stack_id, jnp.int32)
    px = jnp.arange(w, dtype=jnp.float32)
    py = jnp.arange(h, dtype=jnp.float32)
    xp = (fwd[:, None, None, :3, 0] * px[None, None, :, None]
          + fwd[:, None, None, :3, 1] * py[None, :, None, None]
          + fwd[:, None, None, :3, 3])
    ones = jnp.ones(vol_shape, jnp.float32)
    if mask is None:
        mask = ones
    mask = mask.reshape(vol_shape)
    # per-stack conv(1) and conv(mask) volumes, column-stacked into ONE
    # fused corner-major table (16, S*R) and gathered once: both sume
    # and the simulate denominator den are geometry constants (the
    # tables themselves are NOT kept — simulate only rebuilds/gathers
    # the conv(vol*mask) numerator per call)
    tab = jnp.concatenate(
        [jnp.concatenate([make_shingle([conv_separable(ones, t)])
                          for t in fast.terms], axis=1),
         jnp.concatenate([make_shingle([conv_separable(mask, t)])
                          for t in fast.terms], axis=1)], axis=0)
    sume, den = shingle_gather(tab, xp, vol_shape, 2, sid=sid)
    sume = jnp.where(valid & (sume > 0.5), sume, 0.0)
    plan = None
    if getattr(fast, "pallas", False):
        from .pallas_scatter import build_scatter_plan
        plan = build_scatter_plan.__wrapped__(
            xp, sid, tuple(vol_shape), len(fast.terms))
    return FastGeom(xp=xp, valid=valid, sume=sume, sid=sid, den=den,
                    plan=plan)


def fast_simulate(fast: FastPSF, geom: FastGeom, vol, mask, vol_shape):
    """sim, simw, inside — fast analog of psf_gather.

    The denominator (conv(mask))(xp) comes pre-GATHERED from the
    geometry cache (geom.den: mask and xp are constant between geometry
    rebuilds), so the per-call work is only the conv(vol*mask) numerator
    table + one 8-row gather — half the round-3 fused 16-row gather
    (chip profile 2026-08-21: gather was 118 ms of simulate's 187 ms)."""
    vm = vol * mask
    num_tab = jnp.concatenate(
        [make_shingle([conv_separable(vm, t)]) for t in fast.terms],
        axis=1)
    (num,) = shingle_gather(num_tab, geom.xp, vol_shape, 1, sid=geom.sid)
    den = geom.den
    sim = jnp.where(den > 0, num / jnp.where(den > 0, den, 1.0), 0.0)
    gate = (geom.sume > 0.0) & geom.valid
    inside = gate & (den > 0)
    simw = jnp.where(inside,
                     den / jnp.where(geom.sume > 0, geom.sume, 1.0),
                     0.0)
    sim = jnp.where(inside, sim, 0.0)
    return sim, simw, inside


def fast_scatter2(fast: FastPSF, geom: FastGeom, pay_a, pay_b, mask,
                  vol_shape):
    """Transpose accumulation of two payloads (e.g. addon + cmap).

    out_k = mask . sum_stacks K_s * splat(payload_k / sume).
    Payloads must be zero at invalid pixels.  ONE stack-offset scatter
    covers all stacks (same row count as a per-stack loop, shardable);
    the per-stack un-block + adjoint convolution runs on dense volumes.
    """
    inv = jnp.where(geom.sume > 0, 1.0 / jnp.where(geom.sume > 0,
                                                   geom.sume, 1.0), 0.0)
    a = pay_a * inv
    b = pay_b * inv
    S = len(fast.terms)
    if geom.plan is not None:
        # Pallas path: accumulate (val-major) + un-block kernel — the
        # dense per-stack volumes come straight out of the kernels (the
        # XLA transpose-chain un-block measured 295 ms vs 55 ms here)
        from .pallas_scatter import pallas_splat2_packed, pallas_unblock
        vm = pallas_splat2_packed(geom.plan, a, b, tuple(vol_shape), S)
        dense = pallas_unblock(vm, tuple(vol_shape), S)  # (S,2,zs,ys,xs)
        per_stack = [(dense[s, 0], dense[s, 1]) for s in range(S)]
    else:
        blocked = _splat2_blocked(geom.xp, a, b, vol_shape, sid=geom.sid,
                                  n_stacks=S)
        per_stack = [_unblock2(blocked[s], vol_shape) for s in range(S)]
    out = jnp.zeros((2,) + tuple(vol_shape), jnp.float32)
    for (sa, sb), terms in zip(per_stack, fast.terms):
        # batch both payload fields through one adjoint conv pass
        out = out + conv_separable(jnp.stack([sa, sb]), terms, flip=True)
    m = (mask != 0).astype(jnp.float32)
    return out[0] * m, out[1] * m
