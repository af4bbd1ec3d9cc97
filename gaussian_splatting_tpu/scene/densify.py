"""Adaptive density control: clone / split / prune / opacity reset.

Host-side numpy implementation of the reference's densification logic
(gaussian_model.py:500-602), run every `densification_interval` (100)
iterations. The arrays live padded on device; this module pulls them to
host, edits rows, and returns a compacted, re-padded state (growing the
capacity bucket when needed). Host round-trips at this cadence are noise
compared to 100 training steps, and keep the jitted step free of dynamic
shapes — the TPU answer to the reference's optimizer-state surgery.

Semantics replicated exactly:
- clone: avg grad >= threshold AND max scale <= percent_dense * extent
  (gaussian_model.py:543-563); clones keep their Adam moments zeroed for
  the new rows (cat_tensors_to_optimizer, :447-471).
- split: avg grad >= threshold AND max scale > percent_dense * extent;
  N=2 samples drawn from the Gaussian itself, scale /= (0.8 * N) = 1.6,
  originals pruned (:500-541).
- prune: opacity < min_opacity, or (when size_threshold given)
  max world scale > 0.1 * extent. (The reference also checks
  max_radii2D > size_threshold, but densification_postfix has just reset
  max_radii2D to zero for every point (:498), so that test never fires;
  we keep the check for fidelity anyway.)
- densification stats and max_radii2D reset to zero afterwards (:496-498).
- reset_opacity: opacity <- min(opacity, 0.01), Adam moments zeroed for
  the opacity group (:310-321, :366-392).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from gaussian_splatting_tpu.ops import gsmath
from gaussian_splatting_tpu.scene.gaussians import capacity_bucket


def _sigmoid(x):
    return 1.0 / (1.0 + np.exp(-x))


def _inverse_sigmoid(x):
    return np.log(x / (1.0 - x))


def _quat_rotmats(q):
    q = q / np.linalg.norm(q, axis=1, keepdims=True)
    r, x, y, z = q[:, 0], q[:, 1], q[:, 2], q[:, 3]
    R = np.empty((q.shape[0], 3, 3), np.float32)
    R[:, 0, 0] = 1 - 2 * (y * y + z * z)
    R[:, 0, 1] = 2 * (x * y - r * z)
    R[:, 0, 2] = 2 * (x * z + r * y)
    R[:, 1, 0] = 2 * (x * y + r * z)
    R[:, 1, 1] = 1 - 2 * (x * x + z * z)
    R[:, 1, 2] = 2 * (y * z - r * x)
    R[:, 2, 0] = 2 * (x * z - r * y)
    R[:, 2, 1] = 2 * (y * z + r * x)
    R[:, 2, 2] = 1 - 2 * (x * x + y * y)
    return R


@dataclass
class DensifyResult:
    params: dict  # name -> (P_new, ...) live rows only
    adam_m: dict
    adam_v: dict
    n_cloned: int
    n_split: int
    n_pruned: int


def densify_and_prune(
    params: dict,  # name -> np array, live rows only (P, ...)
    adam_m: dict,
    adam_v: dict,
    grad_accum: np.ndarray,  # (P,)
    denom: np.ndarray,  # (P,)
    max_radii2d: np.ndarray,  # (P,)
    max_grad: float,
    min_opacity: float,
    extent: float,
    max_screen_size,  # int or None
    percent_dense: float,
    rng: np.random.Generator,
    n_split_samples: int = 2,
) -> DensifyResult:
    P = params["xyz"].shape[0]
    grads = np.where(denom > 0, grad_accum / np.maximum(denom, 1), 0.0)
    grads = np.nan_to_num(grads)

    scales_act = np.exp(params["scaling"])
    max_scale = scales_act.max(axis=1)

    # ---- clone (gaussian_model.py:543-563) ----
    clone_mask = (grads >= max_grad) & (max_scale <= percent_dense * extent)

    new_params = {k: np.concatenate([v, v[clone_mask]], axis=0) for k, v in params.items()}
    zeros_like_clone = {k: np.zeros_like(v[clone_mask]) for k, v in params.items()}
    new_m = {k: np.concatenate([adam_m[k], zeros_like_clone[k]]) for k in adam_m}
    new_v = {k: np.concatenate([adam_v[k], zeros_like_clone[k]]) for k in adam_v}
    n_cloned = int(clone_mask.sum())

    # ---- split (gaussian_model.py:500-541) ----
    # padded grads: new (cloned) rows have zero grad, so they never split.
    P1 = new_params["xyz"].shape[0]
    padded_grad = np.zeros((P1,), np.float32)
    padded_grad[:P] = grads
    scales1 = np.exp(new_params["scaling"])
    split_mask = (padded_grad >= max_grad) & (scales1.max(axis=1) > percent_dense * extent)
    n_split = int(split_mask.sum())

    if n_split > 0:
        N = n_split_samples
        stds = np.repeat(scales1[split_mask], N, axis=0)  # (N*S, 3)
        samples = rng.normal(0.0, 1.0, stds.shape).astype(np.float32) * stds
        rots = np.repeat(_quat_rotmats(new_params["rotation"][split_mask]), N, axis=0)
        base_xyz = np.repeat(new_params["xyz"][split_mask], N, axis=0)
        split_new = {
            "xyz": np.einsum("bij,bj->bi", rots, samples) + base_xyz,
            "scaling": np.log(np.repeat(scales1[split_mask], N, axis=0) / (0.8 * N)),
            "rotation": np.repeat(new_params["rotation"][split_mask], N, axis=0),
            "features_dc": np.repeat(new_params["features_dc"][split_mask], N, axis=0),
            "features_rest": np.repeat(new_params["features_rest"][split_mask], N, axis=0),
            "opacity": np.repeat(new_params["opacity"][split_mask], N, axis=0),
        }
        new_params = {k: np.concatenate([new_params[k], split_new[k]]) for k in new_params}
        new_m = {k: np.concatenate([new_m[k], np.zeros_like(split_new[k])]) for k in new_m}
        new_v = {k: np.concatenate([new_v[k], np.zeros_like(split_new[k])]) for k in new_v}
        # prune the split originals
        keep = np.ones((new_params["xyz"].shape[0],), bool)
        keep[:P1] = ~split_mask
        new_params = {k: v[keep] for k, v in new_params.items()}
        new_m = {k: v[keep] for k, v in new_m.items()}
        new_v = {k: v[keep] for k, v in new_v.items()}

    # ---- prune (gaussian_model.py:565-594) ----
    opacity_act = _sigmoid(new_params["opacity"][:, 0])
    prune_mask = opacity_act < min_opacity
    if max_screen_size:
        # max_radii2D has been conceptually reset by the postfix steps
        # above (it is zero for every surviving point in the reference
        # at this spot); world-size pruning still applies.
        big_ws = np.exp(new_params["scaling"]).max(axis=1) > 0.1 * extent
        prune_mask = prune_mask | big_ws
    n_pruned = int(prune_mask.sum())
    keep = ~prune_mask
    new_params = {k: v[keep] for k, v in new_params.items()}
    new_m = {k: v[keep] for k, v in new_m.items()}
    new_v = {k: v[keep] for k, v in new_v.items()}

    return DensifyResult(
        params=new_params,
        adam_m=new_m,
        adam_v=new_v,
        n_cloned=n_cloned,
        n_split=n_split,
        n_pruned=n_pruned,
    )


def reset_opacity(params: dict, adam_m: dict, adam_v: dict):
    """opacity <- inverse_sigmoid(min(sigmoid(opacity), 0.01)); zero the
    opacity Adam moments (gaussian_model.py:310-321)."""
    op = _sigmoid(params["opacity"])
    params = dict(params)
    params["opacity"] = _inverse_sigmoid(np.minimum(op, 0.01)).astype(np.float32)
    adam_m = dict(adam_m)
    adam_v = dict(adam_v)
    adam_m["opacity"] = np.zeros_like(adam_m["opacity"])
    adam_v["opacity"] = np.zeros_like(adam_v["opacity"])
    return params, adam_m, adam_v


# ---------------------------------------------------------------------------
# Device-side densification: the same semantics as densify_and_prune above,
# but as a jitted masked edit of the PADDED state at fixed capacity — no
# host round-trip of the (potentially multi-GB) parameter arrays every 100
# iterations, and the arrays can stay sharded across a device mesh. New
# rows are scattered into dead slots (monotone indices = the fast TPU
# scatter path); the host falls back to the numpy path only when the
# children wouldn't fit (capacity-bucket growth). The split samples use
# jax.random instead of the host generator — the reference's torch RNG
# stream is not reproducible anyway.
# ---------------------------------------------------------------------------


def densify_and_prune_device(
    params,  # GaussianParams (capacity-padded)
    adam_m,
    adam_v,
    alive,  # (cap,) bool
    grad_accum,  # (cap,)
    denom,  # (cap,)
    key,  # jax PRNG key
    max_grad: float,
    min_opacity: float,
    extent: float,
    use_size_prune: bool,
    percent_dense: float,
    n_split: int = 2,
):
    """Returns (params', m', v', alive', counts) with counts =
    {n_cloned, n_split, n_pruned, overflow}. When counts['overflow'] is
    nonzero the edit was SKIPPED (identity) — caller must grow capacity
    via the host path."""
    import jax
    import jax.numpy as jnp

    fn = _DENSIFY_JIT.get("fn")
    if fn is None:
        fn = jax.jit(
            _densify_device_impl, static_argnames=("use_size_prune", "n_split")
        )
        _DENSIFY_JIT["fn"] = fn
    return fn(
        params, adam_m, adam_v, alive, grad_accum, denom, key,
        jnp.float32(max_grad), jnp.float32(min_opacity), jnp.float32(extent),
        jnp.float32(percent_dense), use_size_prune=use_size_prune,
        n_split=n_split,
    )


_DENSIFY_JIT: dict = {}


def _densify_device_impl(
    params, adam_m, adam_v, alive, grad_accum, denom, key,
    max_grad, min_opacity, extent, percent_dense,
    use_size_prune: bool, n_split: int,
):
    import jax
    import jax.numpy as jnp

    from gaussian_splatting_tpu.ops import gsmath
    from gaussian_splatting_tpu.ops.binning import _cumsum_1d

    i32 = jnp.int32
    cap = alive.shape[0]
    iota = jnp.arange(cap, dtype=i32)

    grads = jnp.where(denom > 0, grad_accum / jnp.maximum(denom, 1.0), 0.0)
    grads = jnp.nan_to_num(grads)
    scales = jnp.exp(params.scaling)
    max_scale = jnp.max(scales, axis=1)
    op_act = jax.nn.sigmoid(params.opacity[:, 0])

    hot = jnp.logical_and(alive, grads >= max_grad)
    clone = jnp.logical_and(hot, max_scale <= percent_dense * extent)
    split = jnp.logical_and(hot, max_scale > percent_dense * extent)

    # prune mask on originals (gaussian_model.py:587-594; max_radii2D is
    # zero at this point in the reference, see module docstring)
    prune = op_act < min_opacity
    if use_size_prune:
        prune = jnp.logical_or(prune, max_scale > 0.1 * extent)
    keep_orig = jnp.logical_and(alive, jnp.logical_and(~split, ~prune))

    # children that survive the same pass's prune: clones share the
    # parent's values (same mask); split children have scales / (0.8 N)
    clone_child = jnp.logical_and(clone, ~prune)
    child_scales = scales / (0.8 * n_split)
    child_prune = op_act < min_opacity
    if use_size_prune:
        child_prune = jnp.logical_or(
            child_prune, jnp.max(child_scales, axis=1) > 0.1 * extent
        )
    split_child = jnp.logical_and(split, ~child_prune)

    n_children = clone_child.astype(i32) + split_child.astype(i32) * n_split
    ccum = _cumsum_1d(n_children)
    child_off = ccum - n_children
    total_children = ccum[-1]

    dead = ~keep_orig
    dcum = _cumsum_1d(dead.astype(i32))
    dead_rank = dcum - 1  # rank among dead slots
    free_count = dcum[-1]
    # slot_of_rank[r] = index of the r-th dead slot (monotone scatter)
    slot_of_rank = (
        jnp.full((cap,), cap, i32)
        .at[jnp.where(dead, dead_rank, cap)]
        .set(iota, mode="drop")
    )
    overflow = total_children > free_count

    # split sample offsets: x + R(q) @ (eps * scales) (gaussian_model.py:
    # 500-541); rotation matrices from the (normalized) parent quaternions
    eps = jax.random.normal(key, (n_split, cap, 3), params.xyz.dtype)
    rot = gsmath.quat_to_rotmat(params.rotation)  # (cap, 3, 3)
    log_child_scales = jnp.log(jnp.maximum(child_scales, 1e-30))

    new_params, new_m, new_v = params, adam_m, adam_v
    alive_new = keep_orig
    ok = ~overflow

    for j in range(n_split):
        if j == 0:
            active = jnp.logical_or(clone_child, split_child)
        else:
            active = split_child
        rank = child_off + j
        slot = jnp.where(
            jnp.logical_and(active, ok),
            slot_of_rank[jnp.minimum(rank, cap - 1)],
            cap,
        )

        offset = jnp.einsum("pij,pj->pi", rot, eps[j] * scales)
        xyz_j = jnp.where(
            split_child[:, None], params.xyz + offset, params.xyz
        )
        scal_j = jnp.where(split_child[:, None], log_child_scales, params.scaling)
        childvals = params._replace(xyz=xyz_j, scaling=scal_j)

        new_params = jax.tree.map(
            lambda dst, src: dst.at[slot].set(src, mode="drop"),
            new_params, childvals,
        )
        new_m = jax.tree.map(
            lambda dst: dst.at[slot].set(0.0, mode="drop"), new_m
        )
        new_v = jax.tree.map(
            lambda dst: dst.at[slot].set(0.0, mode="drop"), new_v
        )
        alive_new = alive_new.at[slot].set(True, mode="drop")

    # identity when overflowing (host path will grow the bucket)
    sel = lambda a, b: jnp.where(overflow, a, b)
    out_params = jax.tree.map(sel, params, new_params)
    out_m = jax.tree.map(sel, adam_m, new_m)
    out_v = jax.tree.map(sel, adam_v, new_v)
    out_alive = jnp.where(overflow, alive, alive_new)

    counts = {
        "n_cloned": jnp.sum(clone.astype(i32)),
        "n_split": jnp.sum(split.astype(i32)),
        "n_pruned": jnp.sum(jnp.logical_and(alive, prune).astype(i32)),
        "overflow": overflow.astype(i32),
    }
    return out_params, out_m, out_v, out_alive, counts


