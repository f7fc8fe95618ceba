"""Contact-shadow march (ops/sss.py): a THIN occluder floating just above a
receiver must cast a contact shadow.

Reference capability: external/bend_sss_gpu.h (60-sample screen-space sun
march) multiplied into the CSM mask by src/ShadowMaskRenderer.cpp — its whole
point is occluders within the shadow map's bias/texel footprint (a 2048-texel
map over a ~40 m scene-adaptive range resolves ~2 cm/texel, and the slope
bias pushes comparisons further): a 2 cm plate-to-floor gap is invisible to
CSM and ONLY the screen-space march catches it.

The scene is synthetic (analytic plate + floor G-buffer) so ground truth is
exact: every floor pixel knows analytically whether the sun ray toward
sun_dir clears the plate."""

import jax.numpy as jnp
import numpy as np
import pytest

from hobbyrenderer_tpu.models.pathtracer import camera_rays
from hobbyrenderer_tpu.ops.raster import GBuffer
from hobbyrenderer_tpu.ops.sss import (MAX_DISTANCE, _step_distances,
                                       screen_space_shadows)
from hobbyrenderer_tpu.scene.camera import Camera
from hobbyrenderer_tpu.scene.scene import CameraDesc

H, W = 96, 128
PLATE_H = 0.03                       # 3 cm gap: inside the CSM bias window
PLATE_X = (-0.45, 0.05)
PLATE_Z = (-0.6, 0.3)
SUN_DIR = np.array([6.0, -1.0, 0.0]) / np.sqrt(37.0)  # slanted: the shadow
                                                      # lands BESIDE the plate


def _setup():
    desc = CameraDesc()
    desc.position = (0.3, 0.7, 0.9)
    desc.pitch = -0.7
    cam = Camera(desc, W, H)
    cam.jitter_enabled = False
    vc = {k: jnp.asarray(v) for k, v in cam.view_constants(0).items()
          if isinstance(v, np.ndarray)}

    o, d = camera_rays(vc, H, W, jnp.zeros((H, W, 2)))
    o = np.asarray(o).reshape(H, W, 3)
    d = np.asarray(d).reshape(H, W, 3)

    # nearest hit of plate rectangle (y=PLATE_H) vs floor (y=0)
    def plane_t(y0):
        dy = d[..., 1]
        t = (y0 - o[..., 1]) / np.where(np.abs(dy) > 1e-8, dy, 1e-8)
        return np.where((np.abs(dy) > 1e-8) & (t > 0), t, np.inf)

    t_floor = plane_t(0.0)
    t_plate = plane_t(PLATE_H)
    p_plate = o + t_plate[..., None] * d
    on_plate = ((p_plate[..., 0] >= PLATE_X[0]) & (p_plate[..., 0] <= PLATE_X[1])
                & (p_plate[..., 2] >= PLATE_Z[0]) & (p_plate[..., 2] <= PLATE_Z[1]))
    t_plate = np.where(on_plate, t_plate, np.inf)
    t = np.minimum(t_floor, t_plate)
    valid = np.isfinite(t)
    t = np.where(valid, t, 1.0)
    pos = o + t[..., None] * d
    hit_floor = valid & (t_floor <= t_plate)

    VP = np.asarray(vc["view_proj_no_jitter"])
    clip = pos @ VP[:3, :3].T + VP[:3, 3]
    wzz = pos @ VP[3, :3] + VP[3, 3]
    depth = np.where(valid, clip[..., 2] / np.maximum(wzz, 1e-6), 0.0)

    zeros3 = jnp.zeros((H, W, 3), jnp.float32)
    gb = GBuffer(albedo=zeros3, normal=zeros3, geo_normal=zeros3, orm=zeros3,
                 emissive=zeros3, motion=jnp.zeros((H, W, 2), jnp.float32),
                 world_pos=jnp.asarray(pos, jnp.float32),
                 depth=jnp.asarray(depth, jnp.float32),
                 material=jnp.zeros((H, W), jnp.int32),
                 valid=jnp.asarray(valid))

    # analytic ground truth: floor pixel is contact-shadowed iff the ray
    # toward the sun passes through the plate rectangle
    to_sun = -SUN_DIR
    t_up = (PLATE_H - pos[..., 1]) / to_sun[1]
    q = pos + t_up[..., None] * to_sun
    shadowed = (hit_floor
                & (q[..., 0] >= PLATE_X[0]) & (q[..., 0] <= PLATE_X[1])
                & (q[..., 2] >= PLATE_Z[0]) & (q[..., 2] <= PLATE_Z[1]))
    return gb, vc, shadowed, hit_floor


def _erode(m, it=2):
    r = m.copy()
    for _ in range(it):
        r = (r & np.roll(r, 1, 0) & np.roll(r, -1, 0)
             & np.roll(r, 1, 1) & np.roll(r, -1, 1))
    return r


@pytest.mark.quick
def test_contact_shadow_detects_thin_plate():
    gb, vc, shadowed, hit_floor = _setup()
    vis = np.asarray(screen_space_shadows(
        gb, vc, jnp.asarray(SUN_DIR, jnp.float32), scale=1))

    sh_core = _erode(shadowed, 2)
    lit_floor = _erode(hit_floor & ~shadowed, 3)
    assert sh_core.sum() > 50, "test scene must show a shadowed floor region"
    assert lit_floor.sum() > 200

    # the thin-gap contact shadow IS caught (CSM cannot: see module header)
    assert vis[sh_core].mean() < 0.35, \
        f"contact march missed the thin occluder: mean vis {vis[sh_core].mean()}"
    # and open floor stays fully lit (no false occlusion from the window)
    assert vis[lit_floor].min() > 0.99


def test_exponential_schedule_resolves_contact_gap():
    """The first exponential step lands INSIDE a 12 mm contact window; the
    old uniform 8-step schedule's first sample (75 mm) overshoots it — a
    1.2 cm plate-to-floor gap under a near-vertical sun was invisible to the
    old schedule and is multiply-sampled by the new one."""
    t = np.asarray(_step_distances())
    assert t[0] <= 0.01
    assert np.all(np.diff(t) > 0)
    assert abs(t[-1] - MAX_DISTANCE) < 1e-5
    uniform8 = MAX_DISTANCE * (np.arange(8) + 1) / 8.0
    # ray length from the receiver to a 12 mm-high occluder plane along a
    # sun slanted 2:1 — the contact window the march must sample inside
    ray_len_to_plate = 0.012 * np.sqrt(5.0)
    assert (t < ray_len_to_plate).sum() >= 2
    assert (uniform8 < ray_len_to_plate).sum() == 0
