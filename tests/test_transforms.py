import jax.numpy as jnp
import numpy as np
from scipy.spatial.transform import Rotation

from sgs_tpu.core import transforms


def rand_quats(n, seed=0):
    rng = np.random.default_rng(seed)
    q = rng.normal(size=(n, 4))
    return q.astype(np.float32)


def test_quat_to_rotmat_matches_scipy():
    q = rand_quats(50, seed=1)
    got = np.asarray(transforms.quat_to_rotmat(jnp.asarray(q)))
    # scipy uses xyzw ordering; ours is wxyz.
    q_n = q / np.linalg.norm(q, axis=-1, keepdims=True)
    expected = Rotation.from_quat(q_n[:, [1, 2, 3, 0]]).as_matrix()
    np.testing.assert_allclose(got, expected, atol=1e-5)


def test_quat_multiply_composes_rotations():
    a, b = rand_quats(20, 2), rand_quats(20, 3)
    qc = transforms.quat_multiply(jnp.asarray(a), jnp.asarray(b))
    Rc = np.asarray(transforms.quat_to_rotmat(qc))
    Ra = np.asarray(transforms.quat_to_rotmat(jnp.asarray(a)))
    Rb = np.asarray(transforms.quat_to_rotmat(jnp.asarray(b)))
    np.testing.assert_allclose(Rc, Ra @ Rb, atol=1e-5)


def test_covariance_properties():
    rng = np.random.default_rng(4)
    scales = jnp.asarray(np.exp(rng.normal(size=(30, 3))), jnp.float32)
    quats = jnp.asarray(rand_quats(30, 5))
    cov = transforms.covariance_from_scaling_rotation(scales, quats)
    cov_np = np.asarray(cov, dtype=np.float64)
    # Symmetric
    np.testing.assert_allclose(cov_np, np.swapaxes(cov_np, -1, -2), atol=1e-5)
    # PSD with eigenvalues = squared scales
    eig = np.sort(np.linalg.eigvalsh(cov_np), axis=-1)
    expected = np.sort(np.asarray(scales, np.float64) ** 2, axis=-1)
    np.testing.assert_allclose(eig, expected, rtol=1e-3)
    # Determinant = prod(s^2)
    np.testing.assert_allclose(
        np.linalg.det(cov_np), np.prod(np.asarray(scales) ** 2, axis=-1), rtol=1e-3
    )


def test_strip_unstrip_roundtrip():
    rng = np.random.default_rng(6)
    m = rng.normal(size=(10, 3, 3))
    sym = jnp.asarray(m @ np.swapaxes(m, -1, -2), jnp.float32)
    np.testing.assert_allclose(
        transforms.unstrip_symmetric(transforms.strip_symmetric(sym)), sym, rtol=1e-6
    )


def test_scaling_modifier_scales_covariance_quadratically():
    scales = jnp.asarray([[0.5, 1.0, 2.0]], jnp.float32)
    quats = jnp.asarray([[1.0, 0.2, -0.3, 0.1]], jnp.float32)
    c1 = transforms.build_covariance(scales, quats, 1.0)
    c2 = transforms.build_covariance(scales, quats, 2.0)
    np.testing.assert_allclose(np.asarray(c2), 4.0 * np.asarray(c1), rtol=1e-5)


def test_inverse_sigmoid():
    x = jnp.asarray([0.1, 0.5, 0.9], jnp.float32)
    np.testing.assert_allclose(
        1.0 / (1.0 + np.exp(-np.asarray(transforms.inverse_sigmoid(x)))), x, rtol=1e-6
    )
