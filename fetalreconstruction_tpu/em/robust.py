"""EM robust statistics: voxel posteriors, slice mixture model, M-step.

Vectorized reimplementation of the reference's EM layer
(irtkReconstructionGPU.cc): ParallelEStep (:3076), the slice-level
two-Gaussian mixture inside EStep (:3184-3440), ParallelMStep (:4121),
ParallelScale (:3698), InitializeRobustStatistics (:3022).

All formulas operate on padded (N, H, W) slice batches with validity
masks; scalars are 0-d jnp arrays so the whole EM round jits as one
program.  Constants: STEP = 1e-4 (the reference's _step, .cc:161);
G(x, s) = STEP * exp(-x^2/(2s)) / sqrt(6.28 s); M(m) = m * STEP.
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

STEP = 1e-4
SIGMA_FLOOR = STEP * STEP / 6.28


def _gsum(x, axis_name: Optional[str]):
    """Global sum: shard-local jnp.sum plus a psum over the slices mesh
    axis when running under shard_map (replaces the reference's
    cross-device thrust partial sums, reconstruction_cuda2.cu:2279-2306)."""
    s = jnp.sum(x)
    if axis_name is not None:
        s = jax.lax.psum(s, axis_name)
    return s


def _gmin(x, axis_name: Optional[str]):
    s = jnp.min(x)
    if axis_name is not None:
        s = jax.lax.pmin(s, axis_name)
    return s


def _gmax(x, axis_name: Optional[str]):
    s = jnp.max(x)
    if axis_name is not None:
        s = jax.lax.pmax(s, axis_name)
    return s


def gauss(x, s):
    """The reference's G() (irtkReconstructionGPU.h:529)."""
    return STEP * jnp.exp(-x * x / (2.0 * s)) / jnp.sqrt(6.28 * s)


def corrected_slice(slices, bias, scale):
    """slice * exp(-bias) * scale (the universal intensity correction)."""
    return slices * jnp.exp(-bias) * scale[:, None, None]


def init_robust_stats(slices, valid, sim, simw, sim_inside,
                      axis_name=None):
    """Initial sigma^2 = mean squared (slice - sim) over confident voxels
    (sim_inside == 1 and simw > 0.99), matching
    InitializeRobustStatistics (.cc:3040-3060).  Returns (sigma2, num)."""
    use = valid & sim_inside & (simw > 0.99)
    e = jnp.where(use, slices - sim, 0.0)
    num = _gsum(use, axis_name)
    sigma2 = _gsum(e * e, axis_name) / jnp.maximum(num, 1)
    return sigma2, num


def voxel_estep(slices, valid, bias, scale, sim, simw,
                sigma2, m, mix):
    """Voxel posteriors + slice potentials (ParallelEStep, .cc:3096-3143).

    Returns (weights (N,H,W), potential (N,)); potential = -1 where a slice
    has no confident voxels.
    """
    s = corrected_slice(slices, bias, scale)
    use = valid & (simw > 0.0)
    e = jnp.where(use, s - sim, 0.0)
    g = gauss(e, sigma2)
    mterm = m * STEP
    post = g * mix / (g * mix + mterm * (1.0 - mix))
    weights = jnp.where(use, post, 0.0)
    conf = use & (simw > 0.99)
    num = jnp.sum(conf, axis=(1, 2))
    pot_sq = jnp.sum(jnp.where(conf, (1.0 - weights) ** 2, 0.0), axis=(1, 2))
    potential = jnp.where(num > 0,
                          jnp.sqrt(pot_sq / jnp.maximum(num, 1)), -1.0)
    return weights, potential


def slice_mixture(potential, slice_weight, axis_name=None):
    """Slice-level two-Gaussian mixture -> new slice weights + parameters.

    Faithful to EStepGPU (.cc:3284-3440): weighted means/variances of the
    potentials for the inlier (weight) and outlier (1-weight) classes, sigma
    floors of STEP^2/6.28, fallbacks for degenerate cases, posterior slice
    weight gs1*mix_s / (gs1*mix_s + gs2*(1-mix_s)) with one-sided Gaussians,
    and the final mix_s update (mean of new slice weights).

    potential: (N,) with -1 flagging excluded slices.
    Returns (slice_weight, mean_s, mean_s2, sigma_s, sigma_s2, mix_s).
    """
    ok = potential >= 0.0
    w = jnp.where(ok, slice_weight, 0.0)
    wo = jnp.where(ok, 1.0 - slice_weight, 0.0)
    p = jnp.where(ok, potential, 0.0)

    den = _gsum(w, axis_name)
    den2 = _gsum(wo, axis_name)
    sum1 = _gsum(p * w, axis_name)
    sum2 = _gsum(p * wo, axis_name)
    maxs = _gmax(jnp.where(ok, potential, 0.0), axis_name)
    mins = _gmin(jnp.where(ok, potential, 1.0), axis_name)

    mean_s = jnp.where(den > 0, sum1 / jnp.maximum(den, 1e-30), mins)
    mean_s2 = jnp.where(den2 > 0, sum2 / jnp.maximum(den2, 1e-30),
                        (maxs + mean_s) / 2.0)

    vsum1 = _gsum((p - mean_s) ** 2 * w, axis_name)
    vsum2 = _gsum((p - mean_s2) ** 2 * wo, axis_name)
    sigma_s = jnp.where((vsum1 > 0) & (den > 0),
                        jnp.maximum(vsum1 / jnp.maximum(den, 1e-30),
                                    SIGMA_FLOOR),
                        0.025)
    sigma_s2 = jnp.where((vsum2 > 0) & (den2 > 0),
                         vsum2 / jnp.maximum(den2, 1e-30),
                         (mean_s2 - mean_s) ** 2 / 4.0)
    sigma_s2 = jnp.maximum(sigma_s2, SIGMA_FLOOR)

    # posterior slice weights (one-sided gaussians)
    gs1 = jnp.where(potential < mean_s2, gauss(potential - mean_s, sigma_s),
                    0.0)
    gs2 = jnp.where(potential > mean_s, gauss(potential - mean_s2, sigma_s2),
                    0.0)
    # mix_s here is the PREVIOUS iterate (the reference updates it after)
    return ok, gs1, gs2, mean_s, mean_s2, sigma_s, sigma_s2, den


def slice_estep(potential, slice_weight, mix_s, axis_name=None):
    """Full slice-level E-step: returns (new_slice_weight, stats dict)."""
    ok, gs1, gs2, mean_s, mean_s2, sigma_s, sigma_s2, den = \
        slice_mixture(potential, slice_weight, axis_name)
    likelihood = gs1 * mix_s + gs2 * (1.0 - mix_s)
    post = jnp.where(likelihood > 0,
                     gs1 * mix_s / jnp.maximum(likelihood, 1e-30),
                     jnp.where(potential <= mean_s, 1.0,
                               jnp.where(potential >= mean_s2, 0.0, 1.0)))
    # degenerate: all outliers or invalid means -> weight 1
    degenerate = (den <= 0) | (mean_s2 <= mean_s)
    new_w = jnp.where(ok, jnp.where(degenerate, 1.0, post), 0.0)
    # mix_s update: mean of new weights over valid slices
    nvalid = _gsum(ok, axis_name)
    mix_s_new = jnp.where(nvalid > 0,
                          _gsum(jnp.where(ok, new_w, 0.0), axis_name)
                          / jnp.maximum(nvalid, 1), 0.9)
    stats = dict(mean_s=mean_s, mean_s2=mean_s2, sigma_s=sigma_s,
                 sigma_s2=sigma_s2, mix_s=mix_s_new)
    return new_w, stats


def mstep(slices, valid, bias, scale, weights, sim, simw, iteration,
          mix_prev, axis_name=None):
    """Voxel-level M-step (ParallelMStep, .cc:4121-4211 + MStep 4226-4260).

    Returns (sigma2, mix, m).  mix is only updated when iteration > 1.
    """
    s = corrected_slice(slices, bias, scale)
    use = valid & (simw > 0.99)
    e = jnp.where(use, s - sim, 0.0)
    sigma_sum = _gsum(e * e * weights * use, axis_name)
    mix_sum = _gsum(weights * use, axis_name)
    num = _gsum(use, axis_name)
    emin = _gmin(jnp.where(use, e, 0.0), axis_name)
    emax = _gmax(jnp.where(use, e, 0.0), axis_name)
    sigma2 = jnp.maximum(sigma_sum / jnp.maximum(mix_sum, 1e-30), SIGMA_FLOOR)
    mix = jnp.where(iteration > 1, mix_sum / jnp.maximum(num, 1), mix_prev)
    m = 1.0 / jnp.maximum(emax - emin, 1e-30)
    return sigma2, mix, m


def scale_step(slices, valid, bias, weights, sim, simw):
    """Per-slice intensity scale (ParallelScale, .cc:3698-3741):
    scale = sum(w * s * e^-b * sim) / sum(w * (s * e^-b)^2) over confident
    voxels; 1 where the denominator vanishes."""
    eb = jnp.exp(-bias)
    use = valid & (simw > 0.99)
    seb = jnp.where(use, slices * eb, 0.0)
    num = jnp.sum(weights * seb * sim * use, axis=(1, 2))
    den = jnp.sum(weights * seb * seb, axis=(1, 2))
    return jnp.where(den > 0, num / jnp.maximum(den, 1e-30), 1.0)


def scale_volume_factor(slices, valid, weights, slice_weight, sim, simw,
                        axis_name=None):
    """Global volume rescale factor (ScaleVolumeKernel,
    reconstruction_cuda2.cu:3386-3413): sum(w * sw * s * sim) /
    sum(w * sw * sim^2) over confident voxels, with the RAW slice value
    (no bias/scale correction — both reference paths agree on this)."""
    use = valid & (simw > 0.99)
    sw = slice_weight[:, None, None]
    num = _gsum(jnp.where(use, weights * sw * slices * sim, 0.0), axis_name)
    den = _gsum(jnp.where(use, weights * sw * sim * sim, 0.0), axis_name)
    return num / jnp.maximum(den, 1e-30)
