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


# ---------------------------------------------------------------------------
# Device-side (jitted, fixed-capacity) densification
# ---------------------------------------------------------------------------


def _mk_device_state(cap=16, live=8):
    import jax.numpy as jnp

    from gaussian_splatting_tpu.scene.gaussians import GaussianParams

    host = _mk_params(live, scale_log=-5.0)
    rng = np.random.default_rng(4)

    def pad(a):
        out = np.zeros((cap,) + a.shape[1:], a.dtype)
        out[:live] = a
        return jnp.asarray(out)

    params = GaussianParams(**{k: pad(v) for k, v in host.items()})
    m = GaussianParams(**{k: pad(np.ones_like(v)) for k, v in host.items()})
    v_ = GaussianParams(**{k: pad(np.ones_like(v)) for k, v in host.items()})
    alive = jnp.asarray(np.arange(cap) < live)
    return params, m, v_, alive


def test_device_densify_clone_split_prune():
    import jax
    import jax.numpy as jnp

    params, m, v, alive = _mk_device_state()
    cap = 16
    # idx0: clone (high grad, small scale); idx1: split (high grad, big
    # scale); idx2: prune (low opacity); rest survive untouched.
    params = params._replace(
        scaling=params.scaling.at[1].set(1.0),  # exp(1) > 0.01 * extent
        opacity=params.opacity.at[2].set(-10.0),  # sigmoid ~ 4.5e-5
    )
    grads = jnp.zeros((cap,)).at[0].set(1.0).at[1].set(1.0)
    denom = jnp.ones((cap,))

    p2, m2, v2, alive2, counts = densify.densify_and_prune_device(
        params, m, v, alive, grads, denom, jax.random.PRNGKey(0),
        max_grad=0.5, min_opacity=0.005, extent=1.0,
        use_size_prune=False, percent_dense=0.01,
    )
    assert int(counts["overflow"]) == 0
    assert int(counts["n_cloned"]) == 1
    assert int(counts["n_split"]) == 1
    assert int(counts["n_pruned"]) == 1
    a2 = np.asarray(alive2)
    # 8 - split original - pruned + clone child + 2 split children = 9
    assert a2.sum() == 9

    p2h = {k: np.asarray(x) for k, x in p2._asdict().items()}
    # the split original and the pruned gaussian are gone (their slots may
    # be reused by children, so check values, not indices)
    for gone in (np.asarray(params.xyz[1]), np.asarray(params.xyz[2])):
        assert (np.abs(p2h["xyz"][a2] - gone).max(axis=1) > 0).all()
    xyz0 = np.asarray(params.xyz[0])
    # exactly one new exact copy of idx0 besides the original
    copies = (np.abs(p2h["xyz"][a2] - xyz0).max(axis=1) == 0.0).sum()
    assert copies == 2
    # split children: scaling = log(exp(1)/1.6), xyz != parent
    child_rows = a2 & (np.abs(p2h["scaling"][:, 0] - (1.0 - np.log(1.6))) < 1e-5)
    assert child_rows.sum() == 2
    assert (np.abs(p2h["xyz"][child_rows] - np.asarray(params.xyz[1])) > 0).any()
    # new rows have zeroed Adam moments; survivors keep theirs
    m2h = np.asarray(m2.xyz)
    new_rows = a2 & ~np.asarray(alive)
    assert (m2h[new_rows] == 0).all()
    assert (m2h[3] == 1).all()


def test_device_densify_overflow_is_identity():
    import jax
    import jax.numpy as jnp

    params, m, v, alive = _mk_device_state(cap=8, live=8)  # no free slots
    grads = jnp.ones((8,))
    denom = jnp.ones((8,))
    p2, m2, v2, alive2, counts = densify.densify_and_prune_device(
        params, m, v, alive, grads, denom, jax.random.PRNGKey(0),
        max_grad=0.5, min_opacity=0.005, extent=1.0,
        use_size_prune=False, percent_dense=0.01,
    )
    assert int(counts["overflow"]) == 1
    np.testing.assert_array_equal(np.asarray(alive2), np.asarray(alive))
    np.testing.assert_array_equal(np.asarray(p2.xyz), np.asarray(params.xyz))
