"""Microbench: (K, R) row-gather cost vs index locality, row width, and
materialization layout.

HOISTING CAVEAT (round-5 lesson): with a jit-CONSTANT table, the gather
inside the scan body is loop-invariant — XLA hoists it out of the chain
and a "fused gather+reduce" can be constant-folded outright, reporting
fantasy numbers (1.3 ns/row). Every arm below therefore perturbs the
TABLE with the carry so the gather must re-execute per iteration.

Round-5 conclusions (MICROBENCH_gather_r5.log, v5e):
- cost is ~13.8 ns/row, INVARIANT to index locality (random == globally
  sorted == per-run sorted == contiguous), row width (9 vs 16 f32), and
  materialization layout ((K,R) vs (R,K).T; relayout-pinned input or
  opt-barrier change nothing) — an XLA per-row issue floor.
- depth-rank reordering of the record table is therefore worthless, and
  the only lever on the gather stage is K itself.
- Mosaic's in-kernel tpu.dynamic_gather requires input/indices/output of
  identical 2D shape (lowering.py _gather_lowering_rule), so a
  VMEM-resident-table gather kernel cannot span a 262k-row table either.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

P = 262_144
K = 1_835_008  # ~1.84M, multiple of 2^17
N_ITERS = 10


def chain_time(fn, name, c0):
    @jax.jit
    def chain(c0):
        def body(c, _):
            return fn(c), None

        out, _ = jax.lax.scan(body, c0, None, length=N_ITERS)
        return jax.tree.map(lambda x: x.sum(), out)

    jax.block_until_ready(chain(c0))
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        jax.block_until_ready(chain(c0))
        times.append(time.perf_counter() - t0)
    dt = min(times) / N_ITERS
    print(f"{name:56s} {dt * 1e3:8.2f} ms   {dt / K * 1e9:6.2f} ns/row")
    return dt


def main():
    rng = np.random.default_rng(0)
    cols = [jnp.asarray(rng.normal(size=(P,)), jnp.float32) for _ in range(16)]
    idx_rand = jnp.asarray(rng.integers(0, P, size=(K,)), jnp.int32)
    idx_sorted = jnp.sort(idx_rand)
    run = 4096  # per-tile-run-sorted analog (~450 runs of 4096)
    arr = np.asarray(idx_rand).reshape(K // run, run)
    idx_runs = jnp.asarray(np.sort(arr, axis=1).reshape(K), jnp.int32)
    idx_contig = jnp.arange(K, dtype=jnp.int32) % P
    z = lambda s: jnp.zeros(s, jnp.float32)

    def form(r, idx, transposed):
        def f(c):
            eps = (c[0, 0] if c.ndim == 2 else c[0]) * 1e-30
            prow = jnp.stack([x + eps for x in cols[:r]], axis=1)  # (P, r)
            g = jnp.take(prow, idx, axis=0)
            return (g.T if transposed else g) + c * 1e-30

        return f

    for name, idx in [
        ("random idx", idx_rand),
        ("globally sorted idx", idx_sorted),
        ("per-4096-run sorted idx", idx_runs),
        ("contiguous idx (i % P)", idx_contig),
    ]:
        chain_time(form(9, idx, True), f"(9,K).T gather, {name}", z((9, K)))
    chain_time(form(9, idx_rand, False), "(K,9) gather, random idx", z((K, 9)))
    chain_time(form(16, idx_rand, True), "(16,K).T gather, random idx", z((16, K)))
    chain_time(form(4, idx_rand, True), "(4,K).T gather, random idx", z((4, K)))


if __name__ == "__main__":
    main()
