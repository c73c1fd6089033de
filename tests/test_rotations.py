import numpy as np
import jax.numpy as jnp
from scipy.spatial.transform import Rotation

from low_cost_mocap_tpu.ops import rotations as rot


def test_rotvec_to_matrix_matches_scipy():
    rng = np.random.default_rng(0)
    rvecs = rng.normal(size=(64, 3)).astype(np.float32) * 2.0
    ours = np.asarray(rot.rotvec_to_matrix(jnp.asarray(rvecs)))
    ref = Rotation.from_rotvec(rvecs).as_matrix()
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_rotvec_to_matrix_small_angle():
    rvecs = np.array([[0.0, 0.0, 0.0], [1e-8, 0.0, 0.0]], np.float32)
    ours = np.asarray(rot.rotvec_to_matrix(jnp.asarray(rvecs)))
    np.testing.assert_allclose(ours[0], np.eye(3), atol=1e-7)
    assert np.all(np.isfinite(ours))


def test_matrix_to_rotvec_roundtrip():
    rng = np.random.default_rng(1)
    rvecs = rng.normal(size=(64, 3)).astype(np.float32)
    Rm = rot.rotvec_to_matrix(jnp.asarray(rvecs))
    back = np.asarray(rot.matrix_to_rotvec(Rm))
    # the log map is canonical (|theta| <= pi): compare rotations, not vectors
    Rm2 = np.asarray(rot.rotvec_to_matrix(jnp.asarray(back)))
    np.testing.assert_allclose(Rm2, np.asarray(Rm), atol=1e-4)
    # vectors with |theta| < pi must roundtrip exactly
    small = np.linalg.norm(rvecs, axis=1) < np.pi - 1e-3
    np.testing.assert_allclose(back[small], rvecs[small], atol=1e-4)


def test_matrix_to_rotvec_near_pi():
    axis = np.array([1.0, 2.0, -0.5])
    axis /= np.linalg.norm(axis)
    rvec = (axis * (np.pi - 1e-5)).astype(np.float32)
    Rm = Rotation.from_rotvec(rvec).as_matrix().astype(np.float32)
    back = np.asarray(rot.matrix_to_rotvec(jnp.asarray(Rm)))
    ref = Rotation.from_matrix(Rm).as_rotvec()
    # rotvec near pi is unique up to sign of the full vector
    err = min(np.linalg.norm(back - ref), np.linalg.norm(back + ref))
    assert err < 1e-3


def test_single_matrix_unbatched():
    rvec = np.array([0.3, -0.2, 0.9], np.float32)
    Rm = np.asarray(rot.rotvec_to_matrix(jnp.asarray(rvec)))
    assert Rm.shape == (3, 3)
    back = np.asarray(rot.matrix_to_rotvec(jnp.asarray(Rm)))
    np.testing.assert_allclose(back, rvec, atol=1e-5)
