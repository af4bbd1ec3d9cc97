"""Microbench: does (K,16) row-gather cost depend on index locality?

If ascending / per-run-ascending indices gather measurably faster than
random ones, reordering the record table into global depth order (so each
tile's sorted entry run has monotone gaussian IDs) is worth building.
Methodology: scan-chain inside one jit (see docs/PERFORMANCE.md).
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

P = 262_144
K = 1_835_008  # ~1.84M, multiple of 2^17
N_ITERS = 10


def chain_time(fn, name, *args):
    @jax.jit
    def chain(c0):
        def body(c, _):
            out = fn(c, *args)
            return out, None
        out, _ = jax.lax.scan(body, c0, None, length=N_ITERS)
        return out.sum()

    c0 = jnp.zeros((), jnp.float32)
    float(chain(c0))
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(chain(c0))
        times.append(time.perf_counter() - t0)
    dt = min(times) / N_ITERS
    print(f"{name:48s} {dt * 1e3:8.2f} ms   {dt / K * 1e9:6.2f} ns/row")
    return dt


def main():
    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.normal(size=(P, 16)), jnp.float32)

    idx_rand = jnp.asarray(rng.integers(0, P, size=(K,)), jnp.int32)
    idx_sorted = jnp.sort(idx_rand)
    # per-run ascending: like per-tile entry runs after a depth-rank remap.
    # ~450 runs of ~4096 entries, each internally sorted.
    run = 4096
    arr = np.asarray(idx_rand).reshape(K // run, run)
    idx_runs = jnp.asarray(np.sort(arr, axis=1).reshape(K), jnp.int32)
    # contiguous: index i -> i % P (pure streaming, the lower bound)
    idx_contig = (jnp.arange(K, dtype=jnp.int32) % P)

    def g(c, idx):
        rows = jnp.take(table, idx, axis=0)  # (K,16)
        return c + rows[0, 0] * 0.0 + c * 0.0 + rows.sum() * 1e-20

    for name, idx in [
        ("gather random idx", idx_rand),
        ("gather globally sorted idx", idx_sorted),
        ("gather per-4096-run sorted idx", idx_runs),
        ("gather contiguous (i % P)", idx_contig),
    ]:
        chain_time(g, name, idx)


if __name__ == "__main__":
    main()
