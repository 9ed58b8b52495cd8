"""Pallas TPU kernel: fast eval-grade EMD via Sinkhorn-warm-started auction.

WHY. The reference evaluates EMD with a CUDA auction at eps=0.002 /
iters=10000 (reference: python/difffacto/metrics/emd/emd_cuda.cu:23-284,
datasets/evaluation_utils.py:84-89). Its per-iteration cost shrinks with the
unassigned set, so the >10^3-iteration convergence tail is cheap on a GPU.
A dense TPU formulation pays O(n^2) EVERY iteration — the XLA auction in
ops/emd.py measures ~0.5-0.7 s/pair at eval settings (and 10^4-iteration
single dispatches can outlive the device-tunnel watchdog). The 400-shape
generation protocol needs ~480k pairs: days, vs tens of minutes for the
reference. This kernel restores the balance with a TPU-native algorithm:

1. **Annealed log-domain Sinkhorn** (~150 fixed iterations, eps annealed
   0.05 -> 0.002): two tiled passes over the cost matrix per iteration, all
   VMEM-resident, distances recomputed from xyz on the MXU (25 MFLOP — far
   cheaper than storing an f32 (n,n) matrix that wouldn't fit VMEM).
   Produces near-optimal dual prices.
2. **Dense auction mop-up** (<= ~300 iterations, eps=0.002) warm-started
   from the Sinkhorn prices: the same bid/accept semantics as the reference
   CUDA auction, converging in O(10^2) iterations instead of O(10^4)
   because prices start eps-close to optimal. Stragglers after the budget
   are force-assigned to their best object exactly like the reference's
   final iteration (emd_cuda.cu Assign 'last' flag).

Accuracy (vs exact Hungarian, random 512-pt clouds): hybrid lands within
-0.6%..+0.06% of the optimal matching cost; the reference auction's own
force-assign tail puts it in a similar band from below. Validated in
tests/test_ops.py (interpret mode vs scipy) and tools/tpu_emd_check.py.

Mosaic shapes the implementation: no 1D concatenate (per-point state lives
in (1, n) VMEM scratch refs written through ref slices), no powf (annealing
uses exp/ln), and python-unrolled tile loops each get their own stack
transients (blowing the 16 MB VMEM budget), so every tile sweep is a
``fori_loop`` with dynamic ``pl.ds`` slices. The kernel emits the ASSIGNMENT
only; matched distances and the custom-VJP glue stay in ops/emd.py.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG = -1e9


def _emd_hybrid_kernel(
    n, tile, sinkhorn_iters, sinkhorn_inner, auction_iters, auction_chunk,
    eps_final,
    eps_start, eps_decay, cache_dist, auction_from_cache, sinkhorn_rows,
    x1_ref, x2t_ref, sq1_ref, sq2_ref, out_ref,
    f_s, g_s, price_s, assign_s, owner_s, winval_s, winrow_s, m_s, sum_s,
    cnt_s, dist_s,
):
    """One pair per grid step. x1 (1, n, 8) f32 (xyz padded), x2t (1, 8, n),
    sq1/sq2 (1, 1, n); out (1, 1, n) int32 assignment. Scratch: (1, n) vectors,
    an SMEM per-tile unassigned-count vector, plus — when ``cache_dist`` —
    an (n, n) bf16 distance cache."""
    nt = n // tile
    # Sinkhorn may run on a row SUBSAMPLE: only the column potential g feeds
    # the auction warm start (price = -g), and with the launcher pre-permuting
    # x1 the first ``sinkhorn_rows`` rows are a uniform sample, so a
    # rectangular (m, n) sinkhorn yields the same g up to a constant shift
    # (irrelevant to auction bids) plus sampling noise the auction mops up.
    mt = max(1, sinkhorn_rows // tile)
    f32 = jnp.float32

    def dist_tile(t):
        """L2 distances for row tile t (traced index): (tile, n), f32."""
        x1t = x1_ref[0, pl.ds(t * tile, tile), :]              # (tile, 8)
        cross = jnp.dot(
            x1t, x2t_ref[0], preferred_element_type=f32
        )                                                       # (tile, n)
        sq1t = sq1_ref[0, 0, pl.ds(t * tile, tile)]            # (tile,)
        d2 = sq1t[:, None] + sq2_ref[0, 0][None, :] - 2.0 * cross
        return jnp.sqrt(jnp.maximum(d2, 0.0))

    lane_i32 = jax.lax.broadcasted_iota(jnp.int32, (tile, n), 1)
    row_i32 = jax.lax.broadcasted_iota(jnp.int32, (tile, n), 0)

    # Distance cache for the sinkhorn phase: computed ONCE in f32 on the MXU,
    # stored bf16 (n^2/2 bytes; fits VMEM at n<=2048 — larger clouds keep the
    # recompute path, see ``cache_dist`` in the launcher). The K=8 dist matmul
    # is ~6% MXU-efficient, so recomputing it 2x per sinkhorn iteration was
    # the dominant cost; bf16 (~0.4% relative) is plenty for warm-start
    # prices. The auction phase below recomputes exact f32 tiles — final
    # matching accuracy is unchanged.
    if cache_dist:
        def fill_t(t, c):
            dist_s[pl.ds(t * tile, tile), :] = dist_tile(t).astype(jnp.bfloat16)
            return c

        jax.lax.fori_loop(0, nt, fill_t, 0)

        def dist_tile_cached(t):
            return dist_s[pl.ds(t * tile, tile), :].astype(f32)
    else:
        dist_tile_cached = dist_tile

    # The auction emits only the ASSIGNMENT (matched distances are recomputed
    # in f32 outside, ops/emd.py), so bidding from the bf16 cache only
    # perturbs near-ties at ~eps scale — like running at a slightly larger
    # eps. Measured on TPU (tools/tpu_emd_check.py): accuracy unchanged
    # within the hybrid's existing ±0.6% band, and it removes the per-sweep
    # f32 distance recompute (matmul + sqrt over the full (n, n) matrix).
    dist_tile_auction = (
        dist_tile_cached if (cache_dist and auction_from_cache) else dist_tile
    )

    # ------------------------------------------------ phase 1: sinkhorn
    g_s[...] = jnp.zeros((1, n), f32)

    def sink_body(k, carry):
        # powf doesn't legalize in Mosaic: decay^level = exp(level*ln(decay))
        level = (k // sinkhorn_inner).astype(f32)
        eps = jnp.maximum(
            eps_start * jnp.exp(level * math.log(eps_decay)), eps_final
        )

        def row_t(t, c):
            z = (g_s[...] - dist_tile_cached(t)) / eps         # (tile, n)
            zm = jnp.max(z, axis=1, keepdims=True)
            f_s[0, pl.ds(t * tile, tile)] = -eps * (
                jnp.log(jnp.sum(jnp.exp(z - zm), axis=1)) + zm[:, 0]
            )
            return c

        jax.lax.fori_loop(0, mt, row_t, 0)

        m_s[...] = jnp.full((1, n), _NEG, f32)
        sum_s[...] = jnp.zeros((1, n), f32)

        def col_t(t, c):
            ft = f_s[0, pl.ds(t * tile, tile)]                 # (tile,)
            z = (ft[:, None] - dist_tile_cached(t)) / eps      # (tile, n)
            tm = jnp.max(z, axis=0, keepdims=True)             # (1, n)
            m = m_s[...]
            nm = jnp.maximum(m, tm)
            sum_s[...] = sum_s[...] * jnp.exp(m - nm) + jnp.sum(
                jnp.exp(z - nm), axis=0, keepdims=True
            )
            m_s[...] = nm
            return c

        jax.lax.fori_loop(0, mt, col_t, 0)
        g_s[...] = -eps * (jnp.log(jnp.maximum(sum_s[...], 1e-30)) + m_s[...])
        return carry

    jax.lax.fori_loop(0, sinkhorn_iters, sink_body, jnp.int32(0))

    # --------------------------------------- phase 2: auction mop-up
    # auction value = -d - price; warm start price = -g.
    eps = eps_final
    price_s[...] = -g_s[...]
    assign_s[...] = jnp.full((1, n), -1, jnp.int32)
    owner_s[...] = jnp.full((1, n), -1, jnp.int32)

    for t in range(nt):
        cnt_s[0, t] = jnp.int32(tile)

    def bid_t(t, c):
        """Fused sweep step: per-point best/better/inc for tile t, folded
        into the per-object winner accumulators winval_s/winrow_s.

        Tiles with NO unassigned rows are skipped outright — only unassigned
        points bid, so the skip is exact.  This is the TPU analog of the
        reference CUDA auction's shrinking unassigned set (emd_cuda.cu): the
        dense sweep cost decays with convergence instead of staying O(n^2)
        per iteration."""

        def do(_):
            # All-f32 bidding. bf16 bidding (value + the three lane
            # reductions at 2x VPU rate off the bf16 cache) was BUILT AND
            # REJECTED: Mosaic cannot relayout the (tile, n) i1 masks a bf16
            # compare produces (16, 128) tiling against the i32 lane-index
            # vectors (8, 128) — "Invalid relayout ... vector<256x2048xi1>".
            value = -dist_tile_auction(t) - price_s[...]       # (tile, n) f32
            best = jnp.max(value, axis=1, keepdims=True)
            bid = jnp.min(jnp.where(value >= best, lane_i32, n), axis=1)
            masked = jnp.where(lane_i32 == bid[:, None], _NEG, value)
            better = jnp.max(masked, axis=1)
            inc = best[:, 0] - better + eps                    # (tile,)
            unass = assign_s[0, pl.ds(t * tile, tile)] < 0
            cand = jnp.where(unass, inc, _NEG)
            M = jnp.where(lane_i32 == bid[:, None], cand[:, None], _NEG)
            tmax = jnp.max(M, axis=0, keepdims=True)           # (1, n)
            targ = jnp.min(
                jnp.where(M >= tmax, row_i32, n), axis=0, keepdims=True
            )
            upd = tmax > winval_s[...]
            winrow_s[...] = jnp.where(upd, targ + t * tile, winrow_s[...])
            winval_s[...] = jnp.where(upd, tmax, winval_s[...])
            return jnp.int32(0)

        return jax.lax.cond(cnt_s[0, t] > 0, do, lambda _: jnp.int32(0), 0)

    def upd_t(t, n_unass):
        """Per-point update for tile t: claim won objects, evict owners.

        Skipped (count reused) unless this round's winners touch the tile —
        a winning bidder row lives in it, or one of its points owns an
        object that was just taken."""
        taken = winval_s[...] > _NEG / 2
        win_row = winrow_s[...]
        lo, hi = t * tile, (t + 1) * tile
        won_here = jnp.logical_and(taken, jnp.logical_and(win_row >= lo, win_row < hi))
        own = owner_s[...]
        evict_here = jnp.logical_and(taken, jnp.logical_and(own >= lo, own < hi))
        touched = jnp.any(jnp.logical_or(won_here, evict_here))

        def do(_):
            rows = row_i32 + t * tile                          # global ids
            wmatch = jnp.logical_and(win_row == rows, taken)
            newj = jnp.max(jnp.where(wmatch, lane_i32, -1), axis=1)  # (tile,)
            omatch = jnp.logical_and(own == rows, taken)
            evict = jnp.max(jnp.where(omatch, 1, 0), axis=1)
            cur = assign_s[0, pl.ds(t * tile, tile)]
            cur = jnp.where(evict > 0, -1, cur)
            cur = jnp.where(newj >= 0, newj, cur)
            assign_s[0, pl.ds(t * tile, tile)] = cur
            cnt = jnp.sum((cur < 0).astype(jnp.int32))
            cnt_s[0, t] = cnt
            return cnt

        return n_unass + jax.lax.cond(touched, do, lambda _: cnt_s[0, t], 0)

    def one_auction_iter(_):
        """One bid/assign round. Returns the new unassigned count. Once the
        matching has converged (all per-tile counts zero) every bid/update
        cond is false, so extra rounds are cheap no-ops — which makes the
        chunked driver below safe."""
        winval_s[...] = jnp.full((1, n), _NEG, jnp.float32)
        winrow_s[...] = jnp.full((1, n), n, jnp.int32)
        jax.lax.fori_loop(0, nt, bid_t, jnp.int32(0))
        taken = winval_s[...] > _NEG / 2
        price_s[...] = price_s[...] + jnp.where(taken, winval_s[...], 0.0)
        n_unass = jax.lax.fori_loop(0, nt, upd_t, jnp.int32(0))
        owner_s[...] = jnp.where(taken, winrow_s[...], owner_s[...])
        return n_unass

    if auction_chunk <= 1:
        def auc_cond(st):
            it, n_unass = st
            return jnp.logical_and(it < auction_iters, n_unass > 0)

        def auc_body(st):
            it, _ = st
            return it + 1, one_auction_iter(0)

        jax.lax.while_loop(auc_cond, auc_body, (jnp.int32(0), jnp.int32(n)))
    else:
        # Chunked driver: the dynamic-exit while_loop costs a scalar-core
        # sync per iteration; running ``auction_chunk`` rounds per while
        # body amortizes that seam while keeping a coarse early exit.
        # The while covers the full chunks only; the static remainder runs
        # after it so the TOTAL bid rounds never exceed auction_iters even
        # on never-converging inputs (extra remainder rounds after
        # convergence are no-ops).
        n_chunks = auction_iters // auction_chunk
        remainder = auction_iters - n_chunks * auction_chunk

        def auc_cond(st):
            c, n_unass = st
            return jnp.logical_and(c < n_chunks, n_unass > 0)

        def auc_body(st):
            c, _ = st
            n_unass = jax.lax.fori_loop(
                0, auction_chunk, lambda i, u: one_auction_iter(u), jnp.int32(n)
            )
            return c + 1, n_unass

        jax.lax.while_loop(auc_cond, auc_body, (jnp.int32(0), jnp.int32(n)))
        if remainder:
            jax.lax.fori_loop(
                0, remainder, lambda i, u: one_auction_iter(u), jnp.int32(n)
            )

    # force-assign stragglers to their best object (reference 'last' flag)
    def force_t(t, c):
        value = -dist_tile_auction(t) - price_s[...]
        best = jnp.max(value, axis=1, keepdims=True)
        bid = jnp.min(jnp.where(value >= best, lane_i32, n), axis=1)
        cur = assign_s[0, pl.ds(t * tile, tile)]
        out_ref[0, 0, pl.ds(t * tile, tile)] = jnp.where(cur < 0, bid, cur)
        return c

    jax.lax.fori_loop(0, nt, force_t, 0)


def emd_assignment_hybrid(
    xyz1: jnp.ndarray,
    xyz2: jnp.ndarray,
    *,
    sinkhorn_iters: int = 150,
    sinkhorn_inner: int = 30,
    auction_iters: int = 300,
    auction_chunk: int = 1,
    eps: float = 0.002,
    eps_start: float = 0.05,
    eps_decay: float = 0.4,
    tile: int = 256,
    interpret: bool = False,
    auction_from_cache: bool = True,
    sinkhorn_rows: int = 0,
) -> jnp.ndarray:
    """(B, n, 3) x (B, n, 3) -> assignment (B, n) int32 (x1 point -> x2 index).

    n must be a multiple of ``tile`` (reference constraint: n % 1024 == 0,
    emd_module.py:41).

    ``sinkhorn_rows`` (0 = all n): run the warm-start sinkhorn on a uniform
    row subsample of that size — only the column potential g seeds the
    auction prices, so an (m, n) rectangular sinkhorn costs m/n of the full
    one and shifts g by an irrelevant constant plus sampling noise. x1 is
    pre-permuted so "first m rows" IS a uniform sample regardless of any
    part-ordered point layout, and the assignment is un-permuted on the way
    out.
    """
    B, n, _ = xyz1.shape
    if n % tile != 0:
        t = tile
        while t >= 128 and n % t != 0:
            t //= 2
        tile = t if n % t == 0 else n
    m = sinkhorn_rows if 0 < sinkhorn_rows < n else n
    m = max(tile, (m // tile) * tile)
    inv_perm = None
    if m < n:
        import numpy as _np

        perm = _np.random.RandomState(1234).permutation(n)
        inv_perm = jnp.asarray(_np.argsort(perm))
        xyz1 = jnp.take(xyz1, jnp.asarray(perm), axis=1)
    f32 = jnp.float32
    pad = jnp.zeros((B, n, 5), f32)
    x1 = jnp.concatenate([xyz1.astype(f32), pad], axis=-1)        # (B, n, 8)
    x2 = jnp.concatenate([xyz2.astype(f32), pad], axis=-1)
    x2t = jnp.swapaxes(x2, 1, 2)                                   # (B, 8, n)
    sq1 = jnp.sum(xyz1.astype(f32) ** 2, axis=-1)[:, None]         # (B, 1, n)
    sq2 = jnp.sum(xyz2.astype(f32) ** 2, axis=-1)[:, None]

    # The (n, n) bf16 sinkhorn distance cache only fits VMEM up to n=2048
    # (8 MB); larger clouds (e.g. 8192-pt car EMD) recompute tiles instead.
    cache_dist = n <= 2048
    kernel = functools.partial(
        _emd_hybrid_kernel, n, tile, sinkhorn_iters, sinkhorn_inner,
        auction_iters, auction_chunk, eps, eps_start, eps_decay, cache_dist,
        auction_from_cache, m,
    )
    vec_f32 = pltpu.VMEM((1, n), f32)
    vec_i32 = pltpu.VMEM((1, n), jnp.int32)
    assign = pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, n, 8), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, n), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, n), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, n), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, n), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, 1, n), jnp.int32),
        scratch_shapes=[
            vec_f32, vec_f32, vec_f32, vec_i32, vec_i32,
            vec_f32, vec_i32, vec_f32, vec_f32,
            pltpu.SMEM((1, n // tile), jnp.int32),
            pltpu.VMEM((n, n) if cache_dist else (8, 128), jnp.bfloat16),
        ],
        interpret=interpret,
    )(x1, x2t, sq1, sq2)[:, 0]
    if inv_perm is not None:
        assign = jnp.take(assign, inv_perm, axis=1)
    return assign
