"""Camera ray generation tests."""

import numpy as np
import jax.numpy as jnp

from unityraytracer_tpu.camera import Camera, camera_rays, pixel_uv


def test_center_ray_is_forward():
    cam = Camera.create(position=(1, 2, 3), look_at=(1, 2, 10), fov_y_deg=60)
    uv = jnp.asarray([[0.0, 0.0]])
    o, d = camera_rays(cam, uv)
    np.testing.assert_allclose(np.asarray(o)[0], [1, 2, 3], atol=1e-6)
    np.testing.assert_allclose(np.asarray(d)[0], [0, 0, 1], atol=1e-6)


def test_directions_unit_length():
    cam = Camera.create(position=(0, 0, 0), look_at=(3, 1, -2), fov_y_deg=81,
                        aspect=16 / 9)
    uv = jnp.asarray(np.random.default_rng(0).uniform(-1, 1, (100, 2)).astype(np.float32))
    _, d = camera_rays(cam, uv)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(d), axis=-1), 1.0, atol=1e-5)


def test_fov_edges():
    # At uv.y = +1 the ray should make fov/2 with forward (pinhole, aspect 1).
    fov = 60.0
    cam = Camera.create(position=(0, 0, 0), look_at=(0, 0, 1), fov_y_deg=fov)
    o, d = camera_rays(cam, jnp.asarray([[0.0, 1.0]]))
    d = np.asarray(d)[0]
    angle = np.rad2deg(np.arctan2(d[1], d[2]))
    assert np.isclose(angle, fov / 2, atol=1e-4)


def test_left_handed_basis():
    # Looking down +z with +y up, uv.x=+1 must point toward +x (Unity LH).
    cam = Camera.create(position=(0, 0, 0), look_at=(0, 0, 1), fov_y_deg=90)
    _, d = camera_rays(cam, jnp.asarray([[1.0, 0.0]]))
    assert np.asarray(d)[0, 0] > 0.5


def test_pixel_uv_mapping():
    # Bottom-left pixel center -> near (-1,-1); top-right -> near (1,1).
    px = jnp.asarray([0, 15])
    py = jnp.asarray([0, 15])
    jit = jnp.full((2, 2), 0.5)
    uv = np.asarray(pixel_uv(px, py, jit, 16, 16))
    np.testing.assert_allclose(uv[0], [-1 + 1 / 16, -1 + 1 / 16], atol=1e-6)
    np.testing.assert_allclose(uv[1], [1 - 1 / 16, 1 - 1 / 16], atol=1e-6)


def test_dof_focal_plane_invariant():
    # Rays through different lens points must converge on the focal plane.
    cam = Camera.create(position=(0, 0, 0), look_at=(0, 0, 1), fov_y_deg=60,
                        aperture=0.2, focus_dist=5.0)
    uv = jnp.asarray([[0.3, -0.2], [0.3, -0.2]])
    lens = jnp.asarray([[0.9, 0.0], [-0.4, 0.7]])
    o, d = camera_rays(cam, uv, lens)
    o, d = np.asarray(o), np.asarray(d)
    # March each ray to z==5 (forward = +z here) and compare points.
    t0 = 5.0 / d[0, 2]
    t1 = 5.0 / d[1, 2]
    p0 = o[0] + d[0] * t0
    p1 = o[1] + d[1] * t1
    np.testing.assert_allclose(p0, p1, atol=1e-4)


def test_explicit_matrix_matches_lookat():
    cam1 = Camera.create(position=(0, 1, -10), look_at=(0, 1, 0), fov_y_deg=81)
    m = np.asarray(cam1.cam_to_world)
    cam2 = Camera.create(cam_to_world=m, fov_y_deg=81)
    uv = jnp.asarray([[0.25, -0.5]])
    _, d1 = camera_rays(cam1, uv)
    _, d2 = camera_rays(cam2, uv)
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d2), atol=1e-6)


def test_orbit_positions_and_lookat():
    from unityraytracer_tpu.camera import orbit

    c = (1.0, 2.0, 3.0)
    cam = orbit(c, radius=5.0, azimuth_deg=0.0, elevation_deg=0.0)
    pos = np.asarray(cam.position)
    np.testing.assert_allclose(pos, [1.0, 2.0, -2.0], atol=1e-5)
    # Forward column points at the center.
    fwd = np.asarray(cam.cam_to_world)[:3, 2]
    np.testing.assert_allclose(fwd, [0, 0, 1], atol=1e-5)
    # Elevation raises the camera, keeps the distance.
    cam2 = orbit(c, radius=5.0, azimuth_deg=45.0, elevation_deg=30.0)
    p2 = np.asarray(cam2.position)
    assert abs(np.linalg.norm(p2 - np.asarray(c)) - 5.0) < 1e-5
    assert p2[1] > 2.0


def test_interpolate_endpoints_and_rotation():
    from unityraytracer_tpu.camera import interpolate, orbit

    a = orbit((0, 0, 0), 4.0, 0.0, 10.0, fov_y_deg=50.0)
    b = orbit((0, 0, 0), 4.0, 90.0, 10.0, fov_y_deg=70.0)
    for t, ref in ((0.0, a), (1.0, b)):
        m = interpolate(a, b, t)
        np.testing.assert_allclose(np.asarray(m.cam_to_world),
                                   np.asarray(ref.cam_to_world), atol=1e-5)
    mid = interpolate(a, b, 0.5)
    r = np.asarray(mid.cam_to_world)[:3, :3]
    # Slerp keeps the rotation orthonormal (a naive matrix lerp would not).
    np.testing.assert_allclose(r @ r.T, np.eye(3), atol=1e-5)
    assert abs(float(np.asarray(mid.tan_half_fov))
               - 0.5 * (np.tan(np.deg2rad(25)) + np.tan(np.deg2rad(35)))) < 1e-5


def test_turntable_closes_loop():
    from unityraytracer_tpu.camera import turntable

    cams = turntable((0, 1, 0), 3.0, 8, elevation_deg=20.0)
    assert len(cams) == 8
    ps = np.stack([np.asarray(c.position) for c in cams])
    # All on the orbit sphere; distinct azimuths.
    d = np.linalg.norm(ps - np.array([0, 1, 0]), axis=1)
    np.testing.assert_allclose(d, 3.0, atol=1e-5)
    assert np.unique(np.round(ps[:, 0], 4)).size > 4
