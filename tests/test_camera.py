"""Camera API tests against geometric identities (reference CameraMatrix.cpp)."""

import jax.numpy as jnp
import numpy as np

from bundleadjustment_benchmarks_tpu.models import camera
from bundleadjustment_benchmarks_tpu.ops import rodrigues


def random_cameras(n=5, seed=0):
    rng = np.random.default_rng(seed)
    R = np.asarray(rodrigues.exp_rodrigues(jnp.asarray(rng.normal(size=(n, 3)))))
    T = rng.normal(size=(n, 3))
    K = np.zeros((n, 3, 3))
    K[:, 0, 0] = rng.uniform(300, 800, n)
    K[:, 1, 1] = rng.uniform(300, 800, n)
    K[:, 0, 2] = rng.normal(size=n) * 10
    K[:, 1, 2] = rng.normal(size=n) * 10
    K[:, 0, 1] = rng.normal(size=n) * 0.1
    K[:, 2, 2] = 1.0
    return jnp.asarray(K), jnp.asarray(R), jnp.asarray(T)


def test_transform_roundtrip():
    K, R, T = random_cameras()
    p = jnp.asarray(np.random.default_rng(1).normal(size=(5, 3)))
    cam_p = camera.transform_point_into_camera_space(R, T, p)
    back = camera.transform_point_from_camera_space(R, T, cam_p)
    np.testing.assert_allclose(back, p, atol=1e-12)


def test_camera_center_projects_to_origin():
    K, R, T = random_cameras()
    c = camera.camera_center(R, T)
    cam_c = camera.transform_point_into_camera_space(R, T, c)
    np.testing.assert_allclose(cam_c, 0.0, atol=1e-12)


def test_decompose_projection_roundtrip():
    K, R, T = random_cameras()
    P = camera.projection_matrix(K, R, T)
    K2, R2, T2 = camera.decompose_projection(P)
    np.testing.assert_allclose(K2, K, rtol=1e-8, atol=1e-8)
    np.testing.assert_allclose(R2, R, rtol=1e-8, atol=1e-8)
    np.testing.assert_allclose(T2, T, rtol=1e-7, atol=1e-8)


def test_unproject_project_roundtrip():
    K, R, T = random_cameras()
    rng = np.random.default_rng(2)
    X = jnp.asarray(rng.normal(size=(5, 3)))
    cam_X = camera.transform_point_into_camera_space(R, T, X)
    depth = cam_X[..., 2]
    pix = camera.project_point_linear(K, R, T, X)
    X2 = camera.unproject_pixel(K, R, T, pix, depth)
    np.testing.assert_allclose(X2, X, rtol=1e-8, atol=1e-9)


def test_ray_through_pixel():
    K, R, T = random_cameras()
    rng = np.random.default_rng(3)
    X = jnp.asarray(rng.normal(size=(5, 3)) + np.array([0, 0, 3.0]))
    pix = camera.project_point_linear(K, R, T, X)
    ray = camera.get_ray(K, R, T, pix)
    c = camera.camera_center(R, T)
    # X - c must be parallel to ray.
    d = X - c
    cross = jnp.cross(d, ray)
    np.testing.assert_allclose(
        cross / jnp.linalg.norm(d, axis=-1, keepdims=True), 0.0, atol=1e-9
    )


def test_intersect_ray_with_plane():
    K, R, T = random_cameras(1)
    plane = jnp.asarray([0.0, 0.0, 1.0, -5.0])  # z = 5
    pt = camera.intersect_ray_with_plane(K[0], R[0], T[0], plane, 10, 20)
    np.testing.assert_allclose(pt[2], 5.0, atol=1e-9)


def test_is_on_good_side():
    K, R, T = random_cameras()
    c = camera.camera_center(R, T)
    ahead = c + camera.optical_axis(R)  # one unit along viewing direction
    assert bool(jnp.all(camera.is_on_good_side(R, T, ahead)))
    behind = c - camera.optical_axis(R)
    assert not bool(jnp.any(camera.is_on_good_side(R, T, behind)))


def test_normalized_coordinate_roundtrip():
    K, R, T = random_cameras()
    rng = np.random.default_rng(4)
    p = jnp.asarray(rng.normal(size=(5, 2)))
    q = camera.to_normalized_coordinate(K, p)
    back = camera.from_normalized_coordinate(K, q)
    np.testing.assert_allclose(back, p, atol=1e-9)
