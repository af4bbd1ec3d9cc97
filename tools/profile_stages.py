"""Per-stage on-chip timing of the render pipeline (bench.py scene).

Methodology (see memory/tpu-perf-cost-model): dispatch through the axon
tunnel costs ~140 ms wall, so each stage is timed as a lax.scan chain of N
dependent iterations inside ONE jit; one scalar is pulled; min over reps.

Usage: python tools/profile_stages.py [stage ...]
Stages: pre emit gather visits render sortonly micro routing sat
"""

import math
import os
import sys
import time
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gaussian_splatting_tpu.utils.general import enable_compilation_cache

enable_compilation_cache()

from gaussian_splatting_tpu.ops import binning
from gaussian_splatting_tpu.ops.projection import preprocess
from gaussian_splatting_tpu.ops.rasterize import RasterizerConfig, rasterize
from gaussian_splatting_tpu.scene.cameras import Camera

P = int(os.environ.get("GS_BENCH_P", 262_144))
W = int(os.environ.get("GS_BENCH_W", 1920))
H = int(os.environ.get("GS_BENCH_H", 1080))
N_ITERS = int(os.environ.get("GS_BENCH_ITERS", 10))

rng = np.random.default_rng(0)
means = jnp.asarray(rng.normal(0, 1.0, (P, 3)), jnp.float32)
scales = jnp.asarray(np.exp(rng.normal(-4.2, 0.5, (P, 3))), jnp.float32)
quats = jnp.asarray(rng.normal(0, 1, (P, 4)), jnp.float32)
opacities = jnp.asarray(1 / (1 + np.exp(-rng.normal(0.0, 1.0, (P,)))), jnp.float32)
shs_np = rng.normal(0, 0.2, (P, 16, 3)).astype(np.float32)
shs_np[:, 0, :] += 1.0
shs = jnp.asarray(shs_np)

cam = Camera(
    uid=0, colmap_id=0, R=np.eye(3), T=np.array([0.0, 0.0, 4.0]),
    fovx=math.radians(70), fovy=math.radians(70 * H / W), image=None,
    image_name="bench", width=W, height=H,
).arrays()
bg = jnp.zeros(3, jnp.float32)

TILE_W = int(os.environ.get("GS_BENCH_TILE_W", 32))
TILE_H = int(os.environ.get("GS_BENCH_TILE_H", 16))
GRID_X = (W + TILE_W - 1) // TILE_W
GRID_Y = (H + TILE_H - 1) // TILE_H
NUM_TILES = GRID_X * GRID_Y


@jax.jit
def _count():
    prep = preprocess(
        means, scales, quats, opacities, shs, 3, cam, W, H, TILE_W, TILE_H,
    )
    return jnp.sum(prep.tiles_touched)


n_entries = int(_count())
bucket = 1 << int(os.environ.get("GS_BENCH_BUCKET_BITS", 16))
CAP = max(bucket, -(int(n_entries * 1.02) // -bucket) * bucket)
print(f"P={P} entries={n_entries} capacity={CAP} tiles={NUM_TILES}")


def chain_time(fn, label, n=N_ITERS, reps=3):
    """fn(carry_scalar) -> scalar. Times n chained evals inside one jit."""

    @jax.jit
    def chain(c0):
        def body(c, _):
            return fn(c) * 1e-30 + c * 0.5, None

        out, _ = jax.lax.scan(body, c0, None, length=n)
        return out

    c0 = jnp.float32(1.0)
    float(chain(c0))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(chain(c0))
        ts.append(time.perf_counter() - t0)
    ms = min(ts) / n * 1000
    print(f"{label:32s} {ms:8.2f} ms")
    return ms


def _prep(c):
    return preprocess(
        means + c * 0, scales, quats, opacities, shs, 3, cam, W, H, TILE_W, TILE_H,
    )


def _emit(pr):
    return binning.emit_sorted_records(
        pr.means2d, pr.conic, pr.rgb, pr.opacity, pr.depths,
        pr.rect_min, pr.rect_max, pr.tiles_touched, GRID_X, GRID_Y, CAP,
    )


def stage_pre():
    def f(c):
        pr = _prep(c)
        return jnp.sum(pr.means2d) + jnp.sum(pr.tiles_touched)

    chain_time(f, "preprocess")


def stage_emit():
    def f(c):
        pr = _prep(c)
        sr = _emit(pr)
        # touch everything except rec (the gather output)
        return (
            jnp.sum(sr.gauss_id) + jnp.sum(sr.tile_start) + jnp.sum(sr.tile_stop)
        ).astype(jnp.float32)

    chain_time(f, "pre+emit(sort,ranges) no gather")


def stage_gather():
    def f(c):
        pr = _prep(c)
        sr = _emit(pr)
        return jnp.sum(sr.rec[0]) + jnp.sum(sr.gauss_id).astype(jnp.float32)

    chain_time(f, "pre+emit+gather")


def stage_visits():
    def f(c):
        pr = _prep(c)
        sr = _emit(pr)
        v = binning.build_visits(sr.tile_start, sr.tile_stop, CAP, NUM_TILES)
        return (
            jnp.sum(sr.rec[0]) + jnp.sum(v.tile) + jnp.sum(v.voff)
        ).astype(jnp.float32)

    chain_time(f, "pre+emit+gather+visits")


def stage_render():
    cfg = RasterizerConfig(
        backend="pallas", capacity_exact=CAP
    )

    def f(c):
        img = rasterize(
            means, scales, quats, opacities, shs, 3, cam, W, H,
            bg + c * 0, cfg, return_aux=False,
        )
        return img[0, 0, 0]

    chain_time(f, "full render (pallas)")


def stage_sat():
    """Saturation diagnostics: how much kernel work is skippable."""
    cfg = RasterizerConfig(
        backend="pallas", capacity_exact=CAP
    )
    img, aux = rasterize(
        means, scales, quats, opacities, shs, 3, cam, W, H, bg, cfg
    )
    ft = np.asarray(aux["final_t"])
    print(f"final_t: mean={ft.mean():.4f} frac<1e-4={np.mean(ft < 1e-4):.3f}")
    # per-tile: fraction of tiles whose WHOLE 16x16 block saturates
    th, tw = H // 16 * 16, W // 16 * 16
    t = ft[:th, :tw].reshape(th // 16, 16, tw // 16, 16).transpose(0, 2, 1, 3)
    tile_max = t.reshape(-1, 256).max(axis=1)
    print(f"tiles all-saturated: {np.mean(tile_max < 1e-4):.3f}")

    prep = jax.jit(
        lambda: preprocess(means, scales, quats, opacities, shs, 3, cam, W, H, 16, 16)
    )()
    tiles = np.asarray(prep.tiles_touched)
    print(
        f"tiles_touched: mean={tiles.mean():.2f} p50={np.percentile(tiles,50):.0f} "
        f"p95={np.percentile(tiles,95):.0f} max={tiles.max()}"
    )
    sr = jax.jit(
        lambda: binning.emit_sorted_records(
            prep.means2d, prep.conic, prep.rgb, prep.opacity, prep.depths,
            prep.rect_min, prep.rect_max, prep.tiles_touched, GRID_X, GRID_Y, CAP,
        )
    )()
    cnt = np.asarray(sr.tile_stop - sr.tile_start)
    print(
        f"entries/tile: mean={cnt.mean():.1f} p50={np.percentile(cnt,50):.0f} "
        f"p95={np.percentile(cnt,95):.0f} max={cnt.max()}"
    )
    v = binning.build_visits(sr.tile_start, sr.tile_stop, CAP, NUM_TILES)
    print(f"real visits: {int(np.asarray(v.voff)[-1])}  wv={v.tile.shape[0]}")


def stage_micro():
    """Gather / transpose / sort micro-benchmarks at pipeline sizes."""
    K = CAP
    rng2 = np.random.default_rng(1)
    table = jnp.asarray(rng2.normal(size=(P, 16)), jnp.float32)
    idx = jnp.asarray(rng2.integers(0, P, K), jnp.int32)
    drec = jnp.asarray(rng2.normal(size=(16, K)), jnp.float32)
    ord2 = jnp.asarray(rng2.permutation(K), jnp.int32)

    def g_rows(c):
        return jnp.sum(table[idx + (c * 0).astype(jnp.int32)][:, :9])

    chain_time(g_rows, f"gather ({K},16) rows from (P,16)")

    def g_rows_t(c):
        return jnp.sum(table[idx + (c * 0).astype(jnp.int32)].T[:9])

    chain_time(g_rows_t, "gather rows + .T (fwd rec path)")

    # transpose (16,K) -> (K,16) via a trivial Pallas copy kernel
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    BLKT = 2048

    def tkern(x_ref, o_ref):
        o_ref[...] = x_ref[...].T

    def pallas_transpose(x):  # (16, K) -> (K, 16)
        k = x.shape[1]
        return pl.pallas_call(
            tkern,
            grid=(k // BLKT,),
            in_specs=[
                pl.BlockSpec((16, BLKT), lambda i: (0, i), memory_space=pltpu.VMEM)
            ],
            out_specs=pl.BlockSpec(
                (BLKT, 16), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((k, 16), jnp.float32),
        )(x)

    def g_route_now(c):
        d = drec + c * 0
        return jnp.sum(d.T[ord2].T[:9])

    chain_time(g_route_now, "routing: drec.T[ord2].T (r1 path)")

    def g_route_tp(c):
        d = pallas_transpose(drec + c * 0)
        return jnp.sum(d[ord2][:, :9])

    chain_time(g_route_tp, "routing: pallas-T then row gather")

    def tp_only(c):
        return jnp.sum(pallas_transpose(drec + c * 0))

    chain_time(tp_only, "pallas transpose alone")

    key1 = jnp.asarray(rng2.integers(0, NUM_TILES, K), jnp.int32)
    key2 = jnp.asarray(rng2.integers(0, 2**30, K), jnp.int32)
    val = jnp.asarray(rng2.integers(0, P, K), jnp.int32)

    def s3(c):
        a, b, d = jax.lax.sort(
            (key1 + (c * 0).astype(jnp.int32), key2, val), num_keys=2,
            is_stable=False,
        )
        return (jnp.sum(a) + jnp.sum(d)).astype(jnp.float32)

    chain_time(s3, "3-op sort (tile,depth,gid)")

    def s2(c):
        a, b = jax.lax.sort(
            (val + (c * 0).astype(jnp.int32), jnp.arange(K, dtype=jnp.int32)),
            num_keys=1, is_stable=False,
        )
        return (jnp.sum(a) + jnp.sum(b)).astype(jnp.float32)

    chain_time(s2, "2-op sort (gid,iota) routing")

    # searchsorted vs boundary-scatter ranges
    s_tile = jnp.sort(key1)

    def ss(c):
        ids = jnp.arange(NUM_TILES, dtype=jnp.int32) + (c * 0).astype(jnp.int32)
        a = jnp.searchsorted(s_tile, ids, side="left")
        b = jnp.searchsorted(s_tile, ids, side="right")
        return (jnp.sum(a) + jnp.sum(b)).astype(jnp.float32)

    chain_time(ss, "searchsorted ranges x2")

    def bscat(c):
        st = s_tile + (c * 0).astype(jnp.int32)
        prev = jnp.concatenate([jnp.full((1,), -1, jnp.int32), st[:-1]])
        isb = st != prev
        kidx = jnp.arange(K, dtype=jnp.int32)
        # run start per tile id (monotone indices)
        starts = jnp.full((NUM_TILES + 1,), K, jnp.int32).at[
            jnp.where(isb, st, NUM_TILES)
        ].min(kidx, mode="drop")
        # fill empty tiles with next start (reverse cummin)
        starts = jax.lax.cummin(starts[::-1])[::-1]
        return jnp.sum(starts).astype(jnp.float32)

    chain_time(bscat, "boundary-scatter ranges")


def stage_emitparts():
    """Decompose emit_sorted_records + the bwd routing chain into their
    primitive costs at the real pipeline shapes, so 'emit+sort = 28 ms'
    and 'routing = 112 ms' (round-3 stage profile) can be attributed to
    individual ops instead of a cost model."""
    from gaussian_splatting_tpu.ops import composite_pallas as cp

    K = CAP
    rng2 = np.random.default_rng(4)
    counts = jnp.asarray(rng2.integers(0, 20, P), jnp.int32)
    col = jnp.asarray(rng2.integers(0, 2**20, P), jnp.int32)
    offs = jnp.cumsum(counts) - counts
    cols6 = [col + i for i in range(6)]
    cols4 = cols6[:4]
    cols3 = cols6[:3]

    for cols, lbl in ((cols3, "3"), (cols4, "4"), (cols6, "6")):
        def f(c, cols=cols):
            out = binning._expand_many(
                [cc + (c * 0).astype(jnp.int32) for cc in cols], offs, K
            )
            return sum(jnp.sum(o) for o in out).astype(jnp.float32)

        chain_time(f, f"expand_many {lbl} cols")

    def f_c1(c):
        return jnp.sum(
            binning._cumsum_1d(counts + (c * 0).astype(jnp.int32))
        ).astype(jnp.float32)

    chain_time(f_c1, "cumsum_1d (P,)")

    e_lo = jnp.asarray(rng2.integers(-1, 2**31 - 1, K, endpoint=True), jnp.int32)
    e_hi = jnp.zeros((K,), jnp.int32)
    local = jnp.asarray(rng2.integers(0, 30, K), jnp.int32)
    e_rw = jnp.asarray(rng2.integers(1, 9, K), jnp.int32)

    def f_bit(c):
        out = binning._select_tile_bit(
            e_lo + (c * 0).astype(jnp.int32), e_hi, local
        )
        return jnp.sum(out).astype(jnp.float32)

    chain_time(f_bit, "select_tile_bit (K,)")

    def f_divmod(c):
        l2 = local + (c * 0).astype(jnp.int32)
        return jnp.sum(l2 // e_rw + l2 % e_rw).astype(jnp.float32)

    chain_time(f_divmod, "int div+mod by e_rw (K,)")

    # routing-chain pieces, individually (cf. stage_routing = the chain)
    gid = jnp.sort(jnp.asarray(rng2.integers(0, P, K), jnp.int32))
    drec = jnp.asarray(rng2.normal(size=(16, K)), jnp.float32)
    ord2 = jnp.asarray(rng2.permutation(K), jnp.int32)

    def f_s2(c):
        a, b = jax.lax.sort(
            (gid + (c * 0).astype(jnp.int32), jnp.arange(K, dtype=jnp.int32)),
            num_keys=1, is_stable=False,
        )
        return (jnp.sum(a) + jnp.sum(b)).astype(jnp.float32)

    chain_time(f_s2, "(gid,iota) 2-op sort")

    def f_rows(c):
        return jnp.sum(cp.relayout_to_rows(drec + c * 0))

    chain_time(f_rows, "relayout_to_rows (16,K)->(K,16)")

    def f_rowgather(c):
        rows = cp.relayout_to_rows(drec + c * 0)
        return jnp.sum(rows[ord2])

    chain_time(f_rowgather, "relayout + (K,16) row gather")

    def f_csrows(c):
        return jnp.sum(binning._cumsum_rows((drec + c * 0)[:9]))

    chain_time(f_csrows, "cumsum_rows (9,K)")


def stage_gforms():
    """Decide the fastest record-gather FORM at pipeline shapes: the
    gather's measured cost swings 15->53 ms with its consumer (XLA layout
    assignment) and its table size. Each row isolates one form."""
    from functools import partial as _p

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from gaussian_splatting_tpu.ops import relayout as rl

    K = CAP
    R = 16
    rng2 = np.random.default_rng(5)
    table = jnp.asarray(rng2.normal(size=(P, R)), jnp.float32)
    idx = jnp.asarray(rng2.integers(0, P, K), jnp.int32)
    bigtab = jnp.asarray(rng2.normal(size=(K, R)), jnp.float32)
    ord2 = jnp.asarray(rng2.permutation(K), jnp.int32)

    def f_clean(c):
        return jnp.sum(table[idx + (c * 0).astype(jnp.int32)][:, :9])

    chain_time(f_clean, "gather (K,16) rows, sum[:9]")

    def f_pipet(c):
        return jnp.sum(table[idx + (c * 0).astype(jnp.int32)].T[:9])

    chain_time(f_pipet, "gather rows + .T (fwd pipeline)")

    BLK = 16384

    def _sum_rows_kernel(x_ref, o_ref):
        @pl.when(pl.program_id(0) == 0)
        def _():
            o_ref[...] = jnp.zeros_like(o_ref)

        o_ref[...] += jnp.sum(x_ref[...], axis=0, keepdims=True)

    def _consume_rows(x):  # (K, R) row-major Pallas consumer
        return pl.pallas_call(
            _sum_rows_kernel,
            grid=(x.shape[0] // BLK,),
            in_specs=[pl.BlockSpec((BLK, R), lambda b: (b, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, R), lambda b: (0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((1, R), jnp.float32),
        )(x)

    def f_pallas_rows(c):
        g = table[idx + (c * 0).astype(jnp.int32)]
        return jnp.sum(_consume_rows(g))

    chain_time(f_pallas_rows, "gather rows -> pallas row consumer")

    def _sum_t_kernel(x_ref, o_ref):
        @pl.when(pl.program_id(0) == 0)
        def _():
            o_ref[...] = jnp.zeros_like(o_ref)

        o_ref[...] += jnp.sum(x_ref[...].T, axis=1, keepdims=True)

    def _consume_t(x):  # (K, R) blocks transposed in-kernel to (R, BLK)
        return pl.pallas_call(
            _sum_t_kernel,
            grid=(x.shape[0] // BLK,),
            in_specs=[pl.BlockSpec((BLK, R), lambda b: (b, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((R, 1), lambda b: (0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((R, 1), jnp.float32),
        )(x)

    def f_pallas_t(c):
        g = table[idx + (c * 0).astype(jnp.int32)]
        return jnp.sum(_consume_t(g))

    chain_time(f_pallas_t, "gather rows -> pallas .T consumer")

    def f_bigtab(c):
        return jnp.sum(bigtab[ord2 + (c * 0).astype(jnp.int32)][:, :9])

    chain_time(f_bigtab, "gather rows from (K,16) table (bwd)")

    def f_bigtab_pallas(c):
        g = bigtab[ord2 + (c * 0).astype(jnp.int32)]
        return jnp.sum(_consume_t(g))

    chain_time(f_bigtab_pallas, "bwd gather -> pallas .T consumer")

    drec16 = jnp.asarray(rng2.normal(size=(16, K)), jnp.float32)

    def f_rl_rows(c):
        return jnp.sum(rl.relayout_to_rows(drec16 + c * 0))

    chain_time(f_rl_rows, "relayout_to_rows wide blocks")


def stage_grad():
    """Full forward+backward through rasterize (the train step's raster
    part, without losses/Adam). Honors GS_TPU_* routing/scan env flags."""
    cfg = RasterizerConfig(
        backend="pallas", capacity_exact=CAP
    )

    def f(c):
        def loss(m, o):
            img = rasterize(
                m, scales, quats, o, shs, 3, cam, W, H,
                bg + c * 0, cfg, return_aux=False,
            )
            return jnp.sum(img * img)

        g1, g2 = jax.grad(loss, argnums=(0, 1))(means, opacities)
        return jnp.sum(g1) + jnp.sum(g2)

    chain_time(f, "render fwd+bwd (pallas)")


def stage_routing():
    """The backward's gradient-routing chain on real shapes, in its
    shipping form: 10-operand payload sort (regroup by gaussian) + row
    cumsum + relayout-pinned boundary gathers."""
    from gaussian_splatting_tpu.ops import composite_pallas as cp

    K = CAP
    rng2 = np.random.default_rng(2)
    gid = jnp.sort(jnp.asarray(rng2.integers(0, P, K), jnp.int32))
    drec = jnp.asarray(rng2.normal(size=(16, K)), jnp.float32)
    gcounts = jnp.zeros((P,), jnp.int32).at[gid].add(1)

    def f(c):
        d = drec + c * 0
        sorted_ops = jax.lax.sort(
            (gid,) + tuple(d[i] for i in range(9)),
            num_keys=1, is_stable=False,
        )
        dsorted = jnp.stack(sorted_ops[1:], axis=0)  # (9, K)
        ends = binning._cumsum_1d(gcounts)
        starts = ends - gcounts
        csum = binning._cumsum_rows(dsorted)
        rows = cp.relayout_to_rows(csum)
        top = jnp.where(
            (ends > 0)[:, None], rows[jnp.maximum(ends - 1, 0)], 0.0
        )
        bot = jnp.concatenate([jnp.zeros_like(top[:1]), top[:-1]], axis=0)
        return jnp.sum(top - bot)

    chain_time(f, "bwd routing chain")

    # A/B: can the 10-operand sort shrink (VERDICT r4 item 1c)? The 9
    # gradient columns are algebraically irreducible (6 independent
    # moments + 3 drgb rows; see composite_pallas._render_core_bwd), so
    # the only shrink is LOSSY packing: two bf16 halves per f32 payload
    # -> 1 key + 5 payloads. This arm measures the ceiling of that trade
    # (pack/unpack at K size + narrower sort); gradients would carry
    # ~0.4% per-entry quantization, far outside the repo's parity
    # bounds, so it ships only if the win were dramatic.
    def fpack(c):
        d = drec + c * 0
        u32 = jnp.uint32
        def pack(a, b):
            ha = jax.lax.bitcast_convert_type(a.astype(jnp.bfloat16), jnp.uint16).astype(u32)
            hb = jax.lax.bitcast_convert_type(b.astype(jnp.bfloat16), jnp.uint16).astype(u32)
            return jax.lax.bitcast_convert_type((ha << 16) | hb, jnp.int32)
        z = jnp.zeros((K,), jnp.float32)
        packed = [pack(d[0], d[1]), pack(d[2], d[3]), pack(d[4], d[5]),
                  pack(d[6], d[7]), pack(d[8], z)]
        sorted_ops = jax.lax.sort((gid,) + tuple(packed), num_keys=1, is_stable=False)
        def unpack(w):
            wu = jax.lax.bitcast_convert_type(w, u32)
            a = jax.lax.bitcast_convert_type((wu >> 16).astype(jnp.uint16), jnp.bfloat16)
            b = jax.lax.bitcast_convert_type(wu.astype(jnp.uint16), jnp.bfloat16)
            return a.astype(jnp.float32), b.astype(jnp.float32)
        cols = []
        for w in sorted_ops[1:]:
            a, b = unpack(w)
            cols += [a, b]
        dsorted = jnp.stack(cols[:9], axis=0)
        ends = binning._cumsum_1d(gcounts)
        starts = ends - gcounts
        csum = binning._cumsum_rows(dsorted)
        rows = cp.relayout_to_rows(csum)
        top = jnp.where(
            (ends > 0)[:, None], rows[jnp.maximum(ends - 1, 0)], 0.0
        )
        bot = jnp.concatenate([jnp.zeros_like(top[:1]), top[:-1]], axis=0)
        return jnp.sum(top - bot)

    chain_time(fpack, "bwd routing chain, bf16-packed (lossy A/B)")


def stage_train():
    """Full train step (render + L1/SSIM + backward + masked Adam) minus
    the raster part timed by `grad` — the difference is losses+optimizer."""
    from gaussian_splatting_tpu.scene.gaussians import GaussianParams
    from gaussian_splatting_tpu.training import (
        OptimizationConfig, init_train_state, train_step,
    )

    cfg = RasterizerConfig(
        backend="pallas", capacity_exact=CAP
    )
    params = GaussianParams(
        xyz=means,
        features_dc=shs[:, :1],
        features_rest=shs[:, 1:],
        scaling=jnp.log(scales),
        rotation=quats,
        opacity=jnp.log(opacities / (1.0 - opacities))[:, None],
    )
    state0 = init_train_state(params, np.ones((P,), bool))
    gt = jnp.asarray(
        np.random.default_rng(9).uniform(size=(H, W, 3)), np.float32
    )

    kw = dict(
        sh_degree=3, active_sh_degree=3, width=W, height=H,
        raster_cfg=cfg, opt=OptimizationConfig(), spatial_lr_scale=1.0,
    )

    @jax.jit
    def chain(s0):
        def body(s, i):
            s2, m = train_step(s, cam, gt, bg, i + 2, **kw)
            return s2, m["loss"]

        _, ls = jax.lax.scan(body, s0, jnp.arange(N_ITERS, dtype=jnp.int32))
        return ls[-1]

    import time as _t

    float(chain(state0))
    ts = []
    for _ in range(3):
        t0 = _t.perf_counter()
        float(chain(state0))
        ts.append(_t.perf_counter() - t0)
    print(f"{'full train step':32s} {min(ts) / N_ITERS * 1000:8.2f} ms")


def stage_roofline():
    """Speed-of-light analysis (BASELINE.md's north star): calibrate the
    chip's streaming HBM bandwidth and fused-VPU element rate with
    microbenchmarks, then report each pipeline stage against its bound.

    Interpreting the table: a stage near its HBM bound is done — attack
    its BYTES (fewer entries, narrower records). A stage near the VPU
    bound needs fewer lane ops. A stage far from both is issue/latency
    bound (the row gather is the known case: per-row DMA issue rate, not
    bandwidth) — attack its COUNT, not its kernel. `max fps (bound)` says
    whether the 30 fps target is reachable at this entry count at all.
    """
    # --- calibration ---
    S = 64 * 1024 * 1024 // 4  # 64 MB of f32
    x0 = jnp.asarray(np.random.default_rng(3).normal(size=(S,)), jnp.float32)

    def vpu_chain(x):
        for _ in range(64):  # fused: one HBM read, 64 full-size lane ops
            x = x * 1.0000001 + 1e-9
        return x

    def hbm_copy(x):
        return x * 1.0000001  # 4 B read + 4 B write per element

    t_vpu = chain_time(lambda c: vpu_chain(x0 + c).sum(), "calib: 64-op fused chain")
    t_hbm = chain_time(lambda c: hbm_copy(x0 + c).sum(), "calib: streaming copy")
    vpu_rate = 64 * S / (t_vpu / 1e3)  # f32 lane-elements / s
    hbm_bw = 8 * S / (t_hbm / 1e3)  # bytes / s
    print(f"calibrated: VPU ~{vpu_rate / 1e9:.0f} G f32-elem/s, "
          f"HBM ~{hbm_bw / 1e9:.0f} GB/s")

    # --- measured stages (each includes its predecessors; diff them) ---
    t_pre = chain_time(lambda c: jnp.sum(_prep(c).tiles_touched).astype(jnp.float32),
                       "preprocess")
    t_emit = chain_time(
        lambda c: (lambda sr: jnp.sum(sr.tile_stop).astype(jnp.float32))(
            _emit(_prep(c))), "pre+emit(sort)")
    t_gather = chain_time(
        lambda c: (lambda sr: jnp.sum(sr.rec[0]) + jnp.sum(sr.gauss_id)
                   .astype(jnp.float32))(_emit(_prep(c))), "pre+emit+gather")
    cfg = RasterizerConfig(backend="pallas", capacity_exact=CAP,
                           )

    def frender(c):
        img = rasterize(means, scales, quats, opacities, shs, 3, cam, W, H,
                        bg + c * 0, cfg, return_aux=False)
        return img[0, 0, 0]

    t_full = chain_time(frender, "full render (pallas)")

    K = n_entries
    rec_bytes = binning.REC_ROWS * 4  # one f32 row-tile per record field

    # --- bounds ---
    # preprocess: P gaussians x ~26 f32 fields in, ~16 out; VPU ~300 ops
    pre_hbm = (P * (26 + 16) * 4) / hbm_bw * 1e3
    pre_vpu = (P * 300) / vpu_rate * 1e3
    # emit: 4-6 expansion columns (4 B in+out per entry each) + 3-operand
    # sort (~log2(K)/2 passes over 12 B/entry, measured-model: sort is a
    # multi-pass stream) — approximate bytes = cols*8*K + 6*12*K
    emit_hbm = (6 * 8 * K + 6 * 12 * K) / hbm_bw * 1e3
    # gather: read K rows of rec_bytes + write them
    gather_hbm = (2 * rec_bytes * K) / hbm_bw * 1e3
    # kernel: ~46 lane ops per entry x 256 pixels (visit-pair lanes), or
    # stream bytes: records in + image tiles out
    tilepx = 256
    kern_vpu = (46 * K * tilepx) / vpu_rate * 1e3
    kern_hbm = (rec_bytes * K + W * H * 4 * 4) / hbm_bw * 1e3

    m_emit = t_emit - t_pre
    m_gather = t_gather - t_emit
    m_kernel = t_full - t_gather
    rows = [
        ("preprocess", t_pre, max(pre_hbm, pre_vpu)),
        ("emit+sort", m_emit, emit_hbm),
        ("record gather", m_gather, gather_hbm),
        ("composite kernel", m_kernel, max(kern_vpu, kern_hbm)),
    ]
    print(f"\n{'stage':20s} {'measured':>10s} {'bound':>10s} {'of bound':>9s}")
    bound_total = 0.0
    for name, meas, bound in rows:
        bound_total += bound
        pct = 100.0 * bound / max(meas, 1e-9)
        print(f"{name:20s} {meas:9.2f}ms {bound:9.2f}ms {pct:8.0f}%")
    print(f"{'TOTAL frame':20s} {t_full:9.2f}ms {bound_total:9.2f}ms")
    print(f"achieved fps: {1e3 / t_full:.1f}   "
          f"speed-of-light fps at K={K}: {1e3 / bound_total:.1f}")
    print(f"kernel bounds: VPU {kern_vpu:.2f} ms vs HBM {kern_hbm:.2f} ms "
          f"-> {'lane-op' if kern_vpu > kern_hbm else 'bandwidth'} limited")


def stage_comm():
    """Communication-volume accounting for the sharded train step — the
    scaling-efficiency bound that IS computable without a pod (VERDICT r3
    item 7). Counts the exact per-device wire bytes of parallel/
    sharding.py's collectives per step and divides by an ICI rate
    (GS_ICI_GBPS, default 100 GB/s per device effective — conservative
    for v5e's 4x400 Gbps links), then compares against ideal 1/n compute
    from the committed single-chip step time (GS_STEP_MS, default from
    MEASURED.json train). No overlap is assumed, so the efficiency
    numbers are LOWER bounds.

    Collectives per step (parallel/sharding.py::local_step):
      fwd  all_gather   compact records  (P rows x ~61 B)
      bwd  reduce_scatter record cotangents (P rows x 40 B f32)
      fwd  all_gather   image strips     (H*W*3 f32)
      bwd  psum_scatter image cotangent  (H*W*3 f32)
    """
    import json

    ici = float(os.environ.get("GS_ICI_GBPS", 100.0)) * 1e9  # B/s
    step_ms = os.environ.get("GS_STEP_MS")
    if step_ms is None:
        try:
            with open(os.path.join(os.path.dirname(os.path.dirname(
                    os.path.abspath(__file__))), "MEASURED.json")) as f:
                step_ms = 1e3 / json.load(f)["train"]["value"]
        except Exception:
            step_ms = 143.0
    step_ms = float(step_ms)
    rec_b = 61  # fwd record bytes/gaussian
    cot_b = 40  # differentiable f32 cotangent bytes/gaussian
    img_b = W * H * 3 * 4
    print(f"assumptions: ICI {ici / 1e9:.0f} GB/s/device, 1-chip step "
          f"{step_ms:.1f} ms at P={P} ({step_ms * 1e6 / P:.0f} ns/gaussian), "
          f"no overlap")
    print(f"{'P':>10s} {'n':>4s} {'comm MB':>9s} {'comm ms':>9s} "
          f"{'comp ms':>9s} {'effic':>7s}")
    effs = []
    for p_scale in (1, 4, 16):
        p = P * p_scale
        comp1 = step_ms * p_scale  # compute scales ~linearly in P (K ∝ P)
        for n in (2, 4, 8, 16, 32):
            frac = (n - 1) / n
            wire = frac * (p * (rec_b + cot_b) + 2 * img_b)
            comm_ms = wire / ici * 1e3
            comp_ms = comp1 / n
            eff = comp_ms / (comp_ms + comm_ms)
            effs.append((eff, p, n))
            print(f"{p:10d} {n:4d} {wire / 1e6:9.1f} {comm_ms:9.2f} "
                  f"{comp_ms:9.2f} {eff * 100:6.1f}%")
    worst_eff, wp, wn = min(effs)
    print("note: compute/comm per gaussian = "
          f"{step_ms * 1e6 / P:.0f} ns vs {(61 + 40) / (ici / 1e9):.1f} ns "
          "(compute-dense per byte). Worst table point "
          f"{worst_eff * 100:.1f}% at P={wp}, n={wn} — the constant image "
          "term caps tiny per-device loads, so the 80% target is about "
          "sharding LARGE scenes; check the P >= 1M rows.")


STAGES = {
    "comm": stage_comm,
    "roofline": stage_roofline,
    "pre": stage_pre,
    "train": stage_train,
    "emit": stage_emit,
    "gather": stage_gather,
    "visits": stage_visits,
    "render": stage_render,
    "grad": stage_grad,
    "routing": stage_routing,
    "sat": stage_sat,
    "micro": stage_micro,
    "emitparts": stage_emitparts,
    "gforms": stage_gforms,
}

if __name__ == "__main__":
    names = sys.argv[1:] or ["pre", "emit", "gather", "visits", "render", "sat"]
    for nm in names:
        STAGES[nm]()
