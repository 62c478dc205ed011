import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sgs_tpu.core import sh


def random_unit_dirs(n, seed=0):
    rng = np.random.default_rng(seed)
    v = rng.normal(size=(n, 3))
    return v / np.linalg.norm(v, axis=-1, keepdims=True)


def test_orthonormality_monte_carlo():
    """The real SH basis with these constants must be orthonormal over the
    sphere: (1/4pi) * integral b_i b_j dOmega = delta_ij / (4pi) ... i.e.
    E_uniform[b_i b_j] = delta_ij / (4pi). Independent check of every
    constant — a wrong coefficient shows up as a diagonal error."""
    dirs = random_unit_dirs(400_000, seed=1)
    basis = np.asarray(sh.sh_basis(4, jnp.asarray(dirs)))
    gram = basis.T @ basis / basis.shape[0]  # E[b b^T]
    expected = np.eye(25) / (4 * np.pi)
    np.testing.assert_allclose(gram, expected, atol=2.5e-3)


def test_eval_sh_degree_truncation():
    """Higher-order coefficients must not contribute below their degree."""
    rng = np.random.default_rng(2)
    coeffs = jnp.asarray(rng.normal(size=(5, 25, 3)), dtype=jnp.float32)
    dirs = jnp.asarray(random_unit_dirs(5, seed=3), dtype=jnp.float32)
    r0 = sh.eval_sh(0, coeffs, dirs)
    np.testing.assert_allclose(r0, sh.C0 * coeffs[:, 0, :], rtol=1e-6)
    r1a = sh.eval_sh(1, coeffs, dirs)
    r1b = sh.eval_sh(1, coeffs.at[:, 4:, :].set(999.0), dirs)
    np.testing.assert_allclose(r1a, r1b, rtol=1e-6)


def test_eval_sh_matches_reference_formula():
    """Literal transcription of the reference polynomial expansion
    (utils/sh_utils.py:57-112) in numpy, degree 3."""
    rng = np.random.default_rng(4)
    n = 64
    shc = rng.normal(size=(n, 16, 3)).astype(np.float32)
    dirs = random_unit_dirs(n, seed=5).astype(np.float32)
    x, y, z = dirs[:, 0:1], dirs[:, 1:2], dirs[:, 2:3]
    xx, yy, zz = x * x, y * y, z * z
    xy, yz, xz = x * y, y * z, x * z
    C0, C1, C2, C3 = sh.C0, sh.C1, sh.C2, sh.C3
    expected = (
        C0 * shc[:, 0]
        - C1 * y * shc[:, 1] + C1 * z * shc[:, 2] - C1 * x * shc[:, 3]
        + C2[0] * xy * shc[:, 4] + C2[1] * yz * shc[:, 5]
        + C2[2] * (2 * zz - xx - yy) * shc[:, 6]
        + C2[3] * xz * shc[:, 7] + C2[4] * (xx - yy) * shc[:, 8]
        + C3[0] * y * (3 * xx - yy) * shc[:, 9]
        + C3[1] * xy * z * shc[:, 10]
        + C3[2] * y * (4 * zz - xx - yy) * shc[:, 11]
        + C3[3] * z * (2 * zz - 3 * xx - 3 * yy) * shc[:, 12]
        + C3[4] * x * (4 * zz - xx - yy) * shc[:, 13]
        + C3[5] * z * (xx - yy) * shc[:, 14]
        + C3[6] * x * (xx - 3 * yy) * shc[:, 15]
    )
    got = sh.eval_sh(3, jnp.asarray(shc), jnp.asarray(dirs))
    np.testing.assert_allclose(got, expected, rtol=1e-5, atol=1e-5)


def test_rgb_sh_roundtrip():
    rgb = jnp.asarray(np.random.default_rng(6).uniform(size=(10, 3)), jnp.float32)
    np.testing.assert_allclose(sh.sh_to_rgb(sh.rgb_to_sh(rgb)), rgb, rtol=1e-5)


def test_clamped_rgb_gradient_zero_where_clamped():
    coeffs = jnp.zeros((1, 1, 3), jnp.float32).at[0, 0, 0].set(-10.0)
    dirs = jnp.asarray([[0.0, 0.0, 1.0]], jnp.float32)

    def f(c):
        return sh.sh_to_rgb_clamped(0, c, dirs).sum()

    g = jax.grad(f)(coeffs)
    # Channel 0 is clamped at 0 (value -10*C0+0.5 < 0) -> zero grad.
    assert g[0, 0, 0] == 0.0
    # Channels 1, 2 are at +0.5 -> grad C0.
    np.testing.assert_allclose(g[0, 0, 1], sh.C0, rtol=1e-6)
