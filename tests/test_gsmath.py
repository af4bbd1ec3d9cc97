"""Unit tests for the L0 math substrate against numpy oracles."""

import numpy as np
import jax.numpy as jnp

from gaussian_splatting_tpu.ops import gsmath


def test_quat_to_rotmat_orthonormal():
    rng = np.random.default_rng(1)
    q = rng.normal(size=(32, 4)).astype(np.float32)
    R = np.asarray(gsmath.quat_to_rotmat(gsmath.normalize_quat(jnp.array(q))))
    eye = np.einsum("bij,bkj->bik", R, R)
    np.testing.assert_allclose(eye, np.broadcast_to(np.eye(3), eye.shape), atol=1e-5)
    np.testing.assert_allclose(np.linalg.det(R), 1.0, atol=1e-5)


def test_identity_quat():
    q = jnp.array([[1.0, 0.0, 0.0, 0.0]])
    R = np.asarray(gsmath.quat_to_rotmat(q))
    np.testing.assert_allclose(R[0], np.eye(3), atol=1e-7)


def test_cov3d_isotropic():
    # Isotropic scale s with any rotation -> Sigma = s^2 I.
    rng = np.random.default_rng(2)
    q = rng.normal(size=(8, 4)).astype(np.float32)
    s = np.full((8, 3), 0.5, np.float32)
    cov = np.asarray(gsmath.build_cov3d(jnp.array(s), jnp.array(q)))
    np.testing.assert_allclose(cov[:, [0, 3, 5]], 0.25, atol=1e-5)
    np.testing.assert_allclose(cov[:, [1, 2, 4]], 0.0, atol=1e-5)


def test_cov3d_oracle():
    rng = np.random.default_rng(3)
    q = rng.normal(size=(16, 4)).astype(np.float32)
    s = np.exp(rng.normal(size=(16, 3))).astype(np.float32)
    cov = np.asarray(gsmath.build_cov3d(jnp.array(s), jnp.array(q)))
    # numpy oracle
    qn = q / np.linalg.norm(q, axis=1, keepdims=True)
    for i in range(16):
        r, x, y, z = qn[i]
        R = np.array(
            [
                [1 - 2 * (y * y + z * z), 2 * (x * y - r * z), 2 * (x * z + r * y)],
                [2 * (x * y + r * z), 1 - 2 * (x * x + z * z), 2 * (y * z - r * x)],
                [2 * (x * z - r * y), 2 * (y * z + r * x), 1 - 2 * (x * x + y * y)],
            ]
        )
        M = R @ np.diag(s[i])
        S = M @ M.T
        packed = np.array([S[0, 0], S[0, 1], S[0, 2], S[1, 1], S[1, 2], S[2, 2]])
        np.testing.assert_allclose(cov[i], packed, rtol=1e-4, atol=1e-5)


def test_sh_dc_only():
    sh = np.zeros((4, 16, 3), np.float32)
    sh[:, 0, :] = 1.0
    dirs = np.tile(np.array([0.0, 0.0, 1.0], np.float32), (4, 1))
    out = np.asarray(gsmath.eval_sh(3, jnp.array(sh), jnp.array(dirs)))
    np.testing.assert_allclose(out, gsmath.SH_C0, atol=1e-6)


def test_sh_oracle_deg3():
    """Against a direct numpy transcription of utils/sh_utils.py:57-112."""
    rng = np.random.default_rng(4)
    sh = rng.normal(size=(8, 16, 3)).astype(np.float32)
    d = rng.normal(size=(8, 3)).astype(np.float32)
    d = d / np.linalg.norm(d, axis=1, keepdims=True)
    got = np.asarray(gsmath.eval_sh(3, jnp.array(sh), jnp.array(d)))

    C0, C1 = gsmath.SH_C0, gsmath.SH_C1
    C2, C3 = gsmath.SH_C2, gsmath.SH_C3
    x, y, z = d[:, 0:1], d[:, 1:2], d[:, 2:3]
    want = C0 * sh[:, 0]
    want = want - C1 * y * sh[:, 1] + C1 * z * sh[:, 2] - C1 * x * sh[:, 3]
    xx, yy, zz = x * x, y * y, z * z
    xy, yz, xz = x * y, y * z, x * z
    want = (
        want
        + C2[0] * xy * sh[:, 4]
        + C2[1] * yz * sh[:, 5]
        + C2[2] * (2 * zz - xx - yy) * sh[:, 6]
        + C2[3] * xz * sh[:, 7]
        + C2[4] * (xx - yy) * sh[:, 8]
    )
    want = (
        want
        + C3[0] * y * (3 * xx - yy) * sh[:, 9]
        + C3[1] * xy * z * sh[:, 10]
        + C3[2] * y * (4 * zz - xx - yy) * sh[:, 11]
        + C3[3] * z * (2 * zz - 3 * xx - 3 * yy) * sh[:, 12]
        + C3[4] * x * (4 * zz - xx - yy) * sh[:, 13]
        + C3[5] * z * (xx - yy) * sh[:, 14]
        + C3[6] * x * (xx - 3 * yy) * sh[:, 15]
    )
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_rgb_sh_roundtrip():
    rgb = np.array([[0.1, 0.5, 0.9]], np.float32)
    back = np.asarray(gsmath.sh_to_rgb_dc(gsmath.rgb_to_sh(jnp.array(rgb))))
    np.testing.assert_allclose(back, rgb, atol=1e-6)


def test_sh_oracle_deg4():
    """Degree-4 terms against utils/sh_utils.py:95-112 (Python-only in the
    reference; its CUDA path caps at 3)."""
    rng = np.random.default_rng(5)
    sh = rng.normal(size=(8, 25, 3)).astype(np.float32)
    d = rng.normal(size=(8, 3)).astype(np.float32)
    d = d / np.linalg.norm(d, axis=1, keepdims=True)
    got = np.asarray(gsmath.eval_sh(4, jnp.array(sh), jnp.array(d)))
    base = np.asarray(gsmath.eval_sh(3, jnp.array(sh[:, :16]), jnp.array(d)))

    C4 = gsmath.SH_C4
    x, y, z = d[:, 0:1], d[:, 1:2], d[:, 2:3]
    xx, yy, zz = x * x, y * y, z * z
    xy, yz, xz = x * y, y * z, x * z
    want = (
        base
        + C4[0] * xy * (xx - yy) * sh[:, 16]
        + C4[1] * yz * (3 * xx - yy) * sh[:, 17]
        + C4[2] * xy * (7 * zz - 1) * sh[:, 18]
        + C4[3] * yz * (7 * zz - 3) * sh[:, 19]
        + C4[4] * (zz * (35 * zz - 30) + 3) * sh[:, 20]
        + C4[5] * xz * (7 * zz - 3) * sh[:, 21]
        + C4[6] * (xx - yy) * (7 * zz - 1) * sh[:, 22]
        + C4[7] * xz * (xx - 3 * yy) * sh[:, 23]
        + C4[8] * (xx * (xx - 3 * yy) - yy * (3 * xx - yy)) * sh[:, 24]
    )
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_sh_basis_orthonormal_deg4():
    """Independent check of every SH constant and polynomial through
    degree 4: the 25 basis functions must be orthonormal under exact
    spherical quadrature (Gauss-Legendre in cos(theta) x uniform in phi,
    exact for the degree-8 polynomial products involved). A wrong
    constant, a mixed-up monomial, or a cross-term typo breaks the Gram
    identity; transcription typos shared by impl and the deg3/deg4
    oracle tests cannot hide here."""
    nodes, wts = np.polynomial.legendre.leggauss(16)  # z in [-1, 1]
    nphi = 32
    phi = 2 * np.pi * (np.arange(nphi) + 0.5) / nphi
    z = np.repeat(nodes, nphi)
    w = np.repeat(wts, nphi) * (2 * np.pi / nphi)
    s = np.sqrt(1 - np.repeat(nodes, nphi) ** 2)
    d = np.stack([s * np.cos(np.tile(phi, 16)),
                  s * np.sin(np.tile(phi, 16)), z], axis=1)
    # basis matrix: evaluate with one-hot coefficient vectors
    eye = np.eye(25, dtype=np.float64)[None, :, :, None]  # (1, 25, 25, 1)
    sh = np.broadcast_to(eye, (d.shape[0], 25, 25, 1))
    vals = np.asarray(
        gsmath.eval_sh(
            4,
            jnp.array(sh.reshape(-1, 25, 1), jnp.float64),
            jnp.array(np.repeat(d, 25, axis=0), jnp.float64),
        )
    ).reshape(d.shape[0], 25)
    gram = (vals * w[:, None]).T @ vals
    np.testing.assert_allclose(gram, np.eye(25), atol=5e-6)
