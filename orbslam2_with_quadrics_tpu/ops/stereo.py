"""Stereo left-right keypoint matching with subpixel refinement.

Rebuild of ``Frame::ComputeStereoMatches`` (reference src/Frame.cc:466-640):
the reference builds per-row candidate lists then runs a scalar SAD sweep;
here it is one masked [N_l, N_r] Hamming argmin (row band +-2 px scaled by
octave) followed by a vectorized 11x11 SAD search over +-5 px shifts with
parabola subpixel interpolation — the same three-stage contract
(coarse descriptor match -> SAD refine -> parabola) as the reference.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from . import matching, orb


def stereo_match(cfg, img_l, img_r, fl, fr):
    """Returns (ur [N], depth [N]) for left keypoints; -1/0 where no match.

    cfg: FrontendConfig-like (needs bf, fx, scale_factor, n_levels).
    fl: left FrameFeatures (or orb.Features with uv/level/desc/valid).
    fr: right orb.Features.
    """
    n_l = fl.uv.shape[0]
    sf = jnp.asarray(
        [cfg.scale_factor ** i for i in range(cfg.n_levels)], jnp.float32
    )

    # row band: |v_l - v_r| <= 2 * scale(octave_l)
    band = 2.0 * sf[jnp.clip(fl.level, 0, cfg.n_levels - 1)]
    dv = jnp.abs(fl.uv[:, 1:2] - fr.uv[None, :, 1])
    # disparity range: [minD, maxD] = [0, bf/minZ] with minZ = baseline
    # (src/Frame.cc:475-477) => max disparity = fx
    disp = fl.uv[:, 0:1] - fr.uv[None, :, 0]
    mask = (
        fl.valid[:, None]
        & fr.valid[None, :]
        & (dv <= band[:, None])
        & (disp >= -3.0)
        & (disp <= cfg.fx)
        & (jnp.abs(fl.level[:, None] - fr.level[None, :]) <= 1)
    )
    dist = matching.hamming_matrix(fl.desc, fr.desc)
    best_idx, best, _ = matching.best_two(dist, mask)
    ok = best <= matching.TH_HIGH

    # --- SAD subpixel refinement around the matched column ---
    # (reference slides an 11x11 window over +-5 px on the octave image;
    # we refine at level 0 — equivalent up to octave quantization)
    w = 5
    shifts = jnp.arange(-5, 6, dtype=jnp.float32)  # L = 11 shifts
    ys = jnp.clip(jnp.round(fl.uv[:, 1]).astype(jnp.int32), w, img_l.shape[0] - w - 1)
    xl = jnp.clip(jnp.round(fl.uv[:, 0]).astype(jnp.int32), w, img_l.shape[1] - w - 1)
    xr0 = jnp.clip(
        jnp.round(fr.uv[best_idx, 0]).astype(jnp.int32), w + 5, img_l.shape[1] - w - 6
    )

    dyy, dxx = jnp.mgrid[-w : w + 1, -w : w + 1]
    dyy = dyy.reshape(-1)
    dxx = dxx.reshape(-1)

    patch_l = img_l[ys[:, None] + dyy[None, :], xl[:, None] + dxx[None, :]]
    # center-normalized SAD (reference subtracts window center value)
    patch_l = patch_l - patch_l[:, (2 * w + 1) * w + w][:, None]

    def sad_at(shift):
        xs = xr0 + shift.astype(jnp.int32)
        pr = img_r[ys[:, None] + dyy[None, :], xs[:, None] + dxx[None, :]]
        pr = pr - pr[:, (2 * w + 1) * w + w][:, None]
        return jnp.sum(jnp.abs(patch_l - pr), axis=1)

    sads = jax.vmap(sad_at)(shifts)  # [11, N]
    bi = jnp.argmin(sads, axis=0)
    # parabola fit on (bi-1, bi, bi+1) (src/Frame.cc:600-612)
    bi_c = jnp.clip(bi, 1, 9)
    idx = jnp.arange(n_l)
    s0 = sads[bi_c - 1, idx]
    s1 = sads[bi_c, idx]
    s2 = sads[bi_c + 1, idx]
    denom = jnp.maximum(s0 + s2 - 2.0 * s1, 1e-6)
    delta = jnp.clip(0.5 * (s0 - s2) / denom, -1.0, 1.0)

    ur = fr.uv[best_idx, 0] + shifts[bi_c] + delta
    disparity = fl.uv[:, 0] - ur
    ok = ok & (disparity > 0.01) & (disparity < cfg.fx)
    depth = jnp.where(ok, cfg.bf / jnp.maximum(disparity, 1e-6), 0.0)
    return jnp.where(ok, ur, -1.0), depth
