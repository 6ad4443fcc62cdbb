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


def camera_rays_soa(camera: Camera, u, v, lens_u=None, lens_v=None):
    """Generate world-space rays for NDC coordinates, component-SoA.

    All ray math stays in separate per-component arrays (see ops/vec.py for
    the TPU layout rationale — stacked (..., 3) intermediates force padded
    layouts at framebuffer scale).

    Args:
      camera: Camera pytree.
      u, v: (...,) normalized device coords in [-1, 1] (x right, y up),
        already jittered by the caller (the reference jitters with rand() +
        per-frame ``_PixelOffset``, RayTraceShader.compute:448-449).
      lens_u, lens_v: optional (...,) unit-disk samples for thin-lens DoF.

    Returns:
      (origin, direction): two 3-tuples of (...,) components, unit directions.
    """
    from .ops import vec

    m = camera.cam_to_world
    # View-space direction at the image plane (z=1): the full effect of the
    # reference's _CameraInverseProjection * (uv, 0, 1) followed by normalize.
    dx = u * (camera.tan_half_fov * camera.aspect)
    dy = v * camera.tan_half_fov
    # World = R @ (dx, dy, 1); R columns are (right, up, forward).
    d = (m[0, 0] * dx + m[0, 1] * dy + m[0, 2],
         m[1, 0] * dx + m[1, 1] * dy + m[1, 2],
         m[2, 0] * dx + m[2, 1] * dy + m[2, 2])
    d = vec.normalize(d)
    o = tuple(jnp.broadcast_to(m[k, 3], d[0].shape) for k in range(3))

    if lens_u is not None:
        # Thin lens: offset origin on the lens disk, refocus on the plane
        # perpendicular to forward at depth focus_dist.
        fwd = (m[0, 2], m[1, 2], m[2, 2])
        cos_fwd = vec.dot(d, fwd)
        focus_t = camera.focus_dist / jnp.maximum(cos_fwd, 1e-6)
        focal = vec.add(o, vec.scale(d, focus_t))
        lu = lens_u * camera.aperture
        lv = lens_v * camera.aperture
        o = (o[0] + m[0, 0] * lu + m[0, 1] * lv,
             o[1] + m[1, 0] * lu + m[1, 1] * lv,
             o[2] + m[2, 0] * lu + m[2, 1] * lv)
        d = vec.normalize(vec.sub(focal, o))
    return o, d


def camera_rays(camera: Camera, uv: jnp.ndarray, lens_uv=None):
    """Row-vector convenience wrapper: uv (..., 2) -> ((..., 3), (..., 3))."""
    lens_u = lens_uv[..., 0] if lens_uv is not None else None
    lens_v = lens_uv[..., 1] if lens_uv is not None else None
    o, d = camera_rays_soa(camera, uv[..., 0], uv[..., 1], lens_u, lens_v)
    return jnp.stack(o, axis=-1), jnp.stack(d, axis=-1)


def pixel_uv(px, py, jitter_xy, width: int, height: int):
    """NDC uv for pixel indices with sub-pixel jitter in [0,1).

    Mirrors ``(id.xy + rand2 + _PixelOffset) / wh * 2 - 1``
    (RayTraceShader.compute:449); py counts up from the bottom row.
    """
    u = (px.astype(jnp.float32) + jitter_xy[..., 0]) / width * 2.0 - 1.0
    v = (py.astype(jnp.float32) + jitter_xy[..., 1]) / height * 2.0 - 1.0
    return jnp.stack([u, v], axis=-1)
