"""Screen-space contact shadows (Bend-style sun march).

Reference: vendored external/bend_sss_{cpu,gpu}.h used by ShadowMaskRenderer —
a 60-sample screen-space march toward the sun multiplied into the CSM mask
(src/ShadowMaskRenderer.cpp). Captures small-scale contact occlusion that
shadow maps miss.

TPU build: fixed-step world-space march toward the sun projected against the
reversed-Z depth buffer; soft accumulation over the thickness window."""

from __future__ import annotations

import jax
import jax.numpy as jnp

STEPS = 8
MAX_DISTANCE = 0.6      # world units of the contact march
THICKNESS = 0.02        # relative depth window counted as an occluder


def screen_space_shadows(gb, vc, sun_dir, scale: int = 4):
    """(H, W) visibility in [0,1] from a short march toward the sun.

    Marched at 1/scale resolution (the bounce taps still read the full-res
    depth buffer) and bilinearly upsampled — contact shadows are low frequency
    enough, and the march is gather-bound on TPU."""
    H, W = gb.depth.shape
    VP = vc["view_proj_no_jitter"]
    to_sun = -sun_dir

    def project(p):
        w = p @ VP[3, :3] + VP[3, 3]
        w = jnp.maximum(w, 1e-6)
        clip = p @ VP[:3, :3].T + VP[:3, 3]
        ndc = clip / w[..., None]
        x = (ndc[..., 0] * 0.5 + 0.5) * W
        y = (0.5 - ndc[..., 1] * 0.5) * H
        return x, y, ndc[..., 2]

    sh, sw = H // scale, W // scale
    pos = gb.world_pos[::scale, ::scale][:sh, :sw]
    valid_s = gb.valid[::scale, ::scale][:sh, :sw]
    # all step positions are independent (occlusion = max over steps), so the
    # march is ONE flat gather over (steps * px) indices instead of STEPS
    # serial 2D-indexed gathers. TPU scalar gathers are latency-bound at
    # ~9 ns/index regardless of row width, so cost is set purely by index
    # count: quarter-res x 8 steps ~= 1M indices ~= 9 ms (the old half-res
    # 12-step serial form measured ~55 ms)
    t = MAX_DISTANCE * (jnp.arange(STEPS, dtype=jnp.float32) + 1.0) / STEPS
    p = pos[None] + to_sun * t[:, None, None, None]           # (K, sh, sw, 3)
    x, y, z = project(p.reshape(-1, 3))
    on = (x >= 0) & (x < W) & (y >= 0) & (y < H) & (z > 0)
    xi = jnp.clip(x.astype(jnp.int32), 0, W - 1)
    yi = jnp.clip(y.astype(jnp.int32), 0, H - 1)
    zbuf = gb.depth.reshape(-1)[yi * W + xi]
    hit = on & (zbuf > z) & (zbuf < z * (1.0 + THICKNESS))
    occ = jnp.max(hit.reshape(STEPS, sh, sw).astype(jnp.float32), axis=0)
    vis = jnp.where(valid_s, 1.0 - occ, 1.0)
    if scale > 1:
        vis = jax.image.resize(vis, (H, W), method="bilinear")
    return jnp.where(gb.valid, vis, 1.0)
