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
