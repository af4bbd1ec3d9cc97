"""Unit tests for adaptive density control (host-side numpy)."""

import numpy as np

from gaussian_splatting_tpu.scene import densify


def _mk_params(P, scale_log=-3.0):
    return {
        "xyz": np.random.default_rng(0).normal(size=(P, 3)).astype(np.float32),
        "features_dc": np.zeros((P, 1, 3), np.float32),
        "features_rest": np.zeros((P, 15, 3), np.float32),
        "scaling": np.full((P, 3), scale_log, np.float32),
        "rotation": np.tile(np.array([1, 0, 0, 0], np.float32), (P, 1)),
        "opacity": np.full((P, 1), 2.0, np.float32),  # sigmoid(2) ~ 0.88
    }


def _mk_moments(params):
    return (
        {k: np.ones_like(v) for k, v in params.items()},
        {k: np.ones_like(v) for k, v in params.items()},
    )


def test_clone_small_high_grad():
    P = 10
    params = _mk_params(P, scale_log=-5.0)  # tiny scales -> clone path
    m, v = _mk_moments(params)
    grads = np.zeros(P, np.float32)
    grads[:3] = 1.0  # high grad on 3 points
    res = densify.densify_and_prune(
        params, m, v, grads, np.ones(P), np.zeros(P),
        max_grad=0.5, min_opacity=0.005, extent=1.0, max_screen_size=None,
        percent_dense=0.01, rng=np.random.default_rng(1),
    )
    assert res.n_cloned == 3 and res.n_split == 0 and res.n_pruned == 0
    assert res.params["xyz"].shape[0] == P + 3
    # clones are exact copies
    np.testing.assert_array_equal(res.params["xyz"][P:], params["xyz"][:3])
    # new rows got zeroed Adam moments, old rows kept theirs
    assert (res.adam_m["xyz"][P:] == 0).all()
    assert (res.adam_m["xyz"][:P] == 1).all()


def test_split_large_high_grad():
    P = 8
    params = _mk_params(P, scale_log=0.0)  # scale 1.0 > 0.01*extent -> split
    m, v = _mk_moments(params)
    grads = np.zeros(P, np.float32)
    grads[:2] = 1.0
    res = densify.densify_and_prune(
        params, m, v, grads, np.ones(P), np.zeros(P),
        max_grad=0.5, min_opacity=0.005, extent=1.0, max_screen_size=None,
        percent_dense=0.01, rng=np.random.default_rng(1),
    )
    assert res.n_split == 2 and res.n_cloned == 0
    # 2 split originals removed, 4 children added
    assert res.params["xyz"].shape[0] == P - 2 + 4
    # children scales divided by 1.6 (0.8 * N)
    child_scales = np.exp(res.params["scaling"][P - 2:])
    np.testing.assert_allclose(child_scales, 1.0 / 1.6, rtol=1e-5)


def test_prune_low_opacity():
    P = 6
    params = _mk_params(P, scale_log=-5.0)
    params["opacity"][:2] = -10.0  # sigmoid ~ 0 -> prune
    m, v = _mk_moments(params)
    res = densify.densify_and_prune(
        params, m, v, np.zeros(P), np.ones(P), np.zeros(P),
        max_grad=0.5, min_opacity=0.005, extent=1.0, max_screen_size=None,
        percent_dense=0.01, rng=np.random.default_rng(1),
    )
    assert res.n_pruned == 2
    assert res.params["xyz"].shape[0] == P - 2


def test_prune_world_size():
    P = 6
    params = _mk_params(P, scale_log=-5.0)
    params["scaling"][0] = 2.0  # exp(2) ~ 7.4 > 0.1 * extent(1.0)
    m, v = _mk_moments(params)
    res = densify.densify_and_prune(
        params, m, v, np.zeros(P), np.ones(P), np.zeros(P),
        max_grad=0.5, min_opacity=0.005, extent=1.0, max_screen_size=20,
        percent_dense=0.01, rng=np.random.default_rng(1),
    )
    assert res.n_pruned == 1


def test_reset_opacity():
    P = 4
    params = _mk_params(P)
    params["opacity"][:] = 3.0  # sigmoid ~ 0.95
    m, v = _mk_moments(params)
    p2, m2, v2 = densify.reset_opacity(params, m, v)
    op = 1 / (1 + np.exp(-p2["opacity"]))
    np.testing.assert_allclose(op, 0.01, rtol=1e-4)
    assert (m2["opacity"] == 0).all() and (v2["opacity"] == 0).all()
    # other groups untouched
    assert (m2["xyz"] == 1).all()
