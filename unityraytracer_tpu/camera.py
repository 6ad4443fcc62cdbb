"""Camera model and primary-ray generation.

The reference builds rays on-device from two uniforms set by the host
(`RayTraceMaster.cs:773-775`): ``_CameraToWorld`` and
``_CameraInverseProjection``, then per pixel computes
``dir = normalize(R * (invP * (uv, 0, 1)))`` with jittered NDC uv
(`RayTraceShader.compute:142-153,448-450`). We keep the same math but store the
camera as a pytree: a cam-to-world rotation+translation plus the field-of-view
tangents (the only information the inverse projection contributes to a ray at
the near plane), extended with thin-lens depth of field (planned-but-missing in
the reference, README.md:10).

Conventions match the Unity scenes: left-handed, +y up, camera forward +z.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from flax import struct

from .utils.math3d import normalize


@struct.dataclass
class Camera:
    """Pinhole/thin-lens camera.

    Attributes:
      cam_to_world: (4,4) rigid transform; column-major action on column
        vectors. Rotation columns are (right, up, forward).
      tan_half_fov: tan(vertical_fov / 2).
      aspect: width / height.
      aperture: lens radius; 0 disables depth of field.
      focus_dist: focal plane distance along forward.
    """

    cam_to_world: jnp.ndarray
    tan_half_fov: jnp.ndarray
    aspect: jnp.ndarray
    aperture: jnp.ndarray
    focus_dist: jnp.ndarray

    @staticmethod
    def create(position=(0.0, 0.0, 0.0), look_at=None, forward=None,
               up=(0.0, 1.0, 0.0), fov_y_deg: float = 60.0, aspect: float = 1.0,
               aperture: float = 0.0, focus_dist: float = 1.0,
               cam_to_world=None) -> "Camera":
        """Host-side constructor. Provide look_at/forward or a full matrix."""
        if cam_to_world is None:
            pos = np.asarray(position, np.float64)
            if forward is None:
                tgt = np.asarray(
                    look_at if look_at is not None else pos + np.array([0, 0, 1.0]),
                    np.float64)
                fwd = tgt - pos
            else:
                fwd = np.asarray(forward, np.float64)
            fwd = fwd / np.linalg.norm(fwd)
            upv = np.asarray(up, np.float64)
            # Left-handed basis: right = up x forward.
            right = np.cross(upv, fwd)
            right = right / np.linalg.norm(right)
            upv = np.cross(fwd, right)
            m = np.eye(4, dtype=np.float64)
            m[:3, 0], m[:3, 1], m[:3, 2], m[:3, 3] = right, upv, fwd, pos
            cam_to_world = m
        cam_to_world = jnp.asarray(cam_to_world, jnp.float32)
        return Camera(
            cam_to_world=cam_to_world,
            tan_half_fov=jnp.float32(np.tan(np.deg2rad(fov_y_deg) / 2.0)),
            aspect=jnp.float32(aspect),
            aperture=jnp.float32(aperture),
            focus_dist=jnp.float32(focus_dist),
        )

    @property
    def position(self):
        return self.cam_to_world[:3, 3]


def camera_rays(camera: Camera, uv: jnp.ndarray, lens_uv=None):
    """Generate world-space rays for NDC coordinates.

    Args:
      camera: Camera pytree.
      uv: (..., 2) normalized device coords in [-1, 1] (x right, y up), already
        jittered by the caller (the reference jitters with rand() + per-frame
        ``_PixelOffset``, RayTraceShader.compute:448-449).
      lens_uv: optional (..., 2) unit-disk samples for thin-lens DoF.

    Returns:
      (origins, directions): each (..., 3), directions unit length.
    """
    R = camera.cam_to_world[:3, :3]
    origin = camera.cam_to_world[:3, 3]

    # View-space direction at the image plane (z=1): the full effect of the
    # reference's _CameraInverseProjection * (uv, 0, 1) followed by normalize.
    dx = uv[..., 0] * camera.tan_half_fov * camera.aspect
    dy = uv[..., 1] * camera.tan_half_fov
    d_view = jnp.stack([dx, dy, jnp.ones_like(dx)], axis=-1)
    d_world = d_view @ R.T
    d_world = normalize(d_world)

    o = jnp.broadcast_to(origin, d_world.shape)
    if lens_uv is not None:
        # Thin lens: offset origin on the lens disk, refocus on the plane
        # perpendicular to forward at depth focus_dist.
        forward = camera.cam_to_world[:3, 2]
        cos_fwd = jnp.sum(d_world * forward, axis=-1)
        focus_t = camera.focus_dist / jnp.maximum(cos_fwd, 1e-6)
        focal_pt = o + d_world * focus_t[..., None]
        lens_off = (camera.cam_to_world[:3, 0] * (lens_uv[..., :1] * camera.aperture)
                    + camera.cam_to_world[:3, 1] * (lens_uv[..., 1:2] * camera.aperture))
        o = o + lens_off
        d_world = normalize(focal_pt - o)
    return o, d_world


def pixel_uv(px, py, jitter_xy, width: int, height: int):
    """NDC uv for pixel indices with sub-pixel jitter in [0,1).

    Mirrors ``(id.xy + rand2 + _PixelOffset) / wh * 2 - 1``
    (RayTraceShader.compute:449); py counts up from the bottom row.
    """
    u = (px.astype(jnp.float32) + jitter_xy[..., 0]) / width * 2.0 - 1.0
    v = (py.astype(jnp.float32) + jitter_xy[..., 1]) / height * 2.0 - 1.0
    return jnp.stack([u, v], axis=-1)
