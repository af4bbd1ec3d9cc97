"""Approximate 3-nearest-neighbor mean squared distance for scale init.

TPU-native replacement for submodules/simple-knn (simple_knn.cu:45-213,
spatial.cu:15-26): the reference Morton-sorts points and scans nearby
candidates in the sorted order. We do the same — 10-bit-per-axis Morton
codes, a single lax.sort, and a +-WINDOW candidate sweep in sorted order —
entirely in jnp. This is an *approximation* in the same spirit as the
reference (quality only affects the initial log-scale of each Gaussian,
gaussian_model.py:202-210).

For small point sets an exact chunked brute force is provided and used
automatically (it is cheap below ~200k points on a TPU chip).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _expand_bits(v):
    """Spread 10 bits of v over 30 bits (Morton interleave helper).

    Masks are explicit uint32: with x64 disabled, Python ints above 2^31
    fail to weak-type into a 32-bit lane.
    """
    u = jnp.uint32
    v = (v * u(0x00010001)) & u(0xFF0000FF)
    v = (v * u(0x00000101)) & u(0x0F00F00F)
    v = (v * u(0x00000011)) & u(0xC30C30C3)
    v = (v * u(0x00000005)) & u(0x49249249)
    return v


def morton_codes(points: jnp.ndarray) -> jnp.ndarray:
    """(P, 3) float -> (P,) uint32 Morton codes over the bounding box."""
    pmin = points.min(axis=0)
    pmax = points.max(axis=0)
    extent = jnp.maximum(pmax - pmin, 1e-9)
    q = jnp.clip((points - pmin) / extent, 0.0, 1.0)
    grid = (q * 1023.0).astype(jnp.uint32)
    x = _expand_bits(grid[:, 0])
    y = _expand_bits(grid[:, 1])
    z = _expand_bits(grid[:, 2])
    return (x << 2) | (y << 1) | z


@partial(jax.jit, static_argnames=("window", "k"))
def mean_knn_dist2_morton(points: jnp.ndarray, window: int = 16, k: int = 3) -> jnp.ndarray:
    """Mean squared distance to (approx) k nearest neighbors, per point."""
    P = points.shape[0]
    codes = morton_codes(points)
    order = jnp.argsort(codes).astype(jnp.int32)
    sorted_pts = points[order]

    # Candidate distances to +-window neighbors in Morton order.
    d2s = []
    for off in range(1, window + 1):
        for sign in (-1, 1):
            idx = jnp.clip(jnp.arange(P) + sign * off, 0, P - 1)
            diff = sorted_pts - sorted_pts[idx]
            d2 = jnp.sum(diff * diff, axis=-1)
            # Out-of-range (clipped to self) -> inf
            valid = (jnp.arange(P) + sign * off >= 0) & (jnp.arange(P) + sign * off < P)
            d2s.append(jnp.where(valid, d2, jnp.inf))
    cand = jnp.stack(d2s, axis=-1)  # (P, 2*window)
    topk = -jax.lax.top_k(-cand, k)[0]  # k smallest
    mean_d2 = jnp.where(jnp.isfinite(topk), topk, 0.0).sum(axis=-1) / jnp.maximum(
        jnp.isfinite(topk).sum(axis=-1), 1
    )
    out = jnp.zeros((P,), points.dtype).at[order].set(mean_d2)
    return out


@partial(jax.jit, static_argnames=("k", "chunk"))
def mean_knn_dist2_exact(points: jnp.ndarray, k: int = 3, chunk: int = 1024) -> jnp.ndarray:
    """Exact chunked brute-force mean of k smallest squared distances."""
    P = points.shape[0]
    C = min(chunk, P)
    n_chunks = (P + C - 1) // C
    pad = n_chunks * C - P
    q = jnp.pad(points, ((0, pad), (0, 0)))
    qs = q.reshape(n_chunks, C, 3)

    def one_chunk(qc, base):
        d2 = jnp.sum((qc[:, None, :] - points[None, :, :]) ** 2, axis=-1)  # (C, P)
        row = base + jnp.arange(C)
        self_mask = jnp.arange(P)[None, :] == row[:, None]
        d2 = jnp.where(self_mask, jnp.inf, d2)
        topk = -jax.lax.top_k(-d2, k)[0]
        return topk.mean(axis=-1)

    bases = jnp.arange(n_chunks) * C
    out = jax.lax.map(lambda args: one_chunk(*args), (qs, bases))
    return out.reshape(-1)[:P]


def mean_knn_dist2(points: jnp.ndarray, k: int = 3) -> jnp.ndarray:
    """distCUDA2 equivalent: mean sq-dist to the 3 nearest neighbors.

    Large clouds prefer the multithreaded native host sweep
    (native/gs_native.cc, the simple-knn equivalent) when built; the jnp
    Morton path covers every environment.
    """
    if points.shape[0] <= 20000:
        return mean_knn_dist2_exact(points, k=k)
    if k == 3:
        from gaussian_splatting_tpu.utils.native import get_native

        native = get_native()
        if native is not None:
            import numpy as np

            host = np.asarray(points, np.float32)
            return jnp.asarray(native.mean_knn_dist2(host), points.dtype)
    return mean_knn_dist2_morton(points, k=k)
