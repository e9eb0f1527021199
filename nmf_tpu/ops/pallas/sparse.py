"""Pallas TPU sparse-dense matmul over the tiled-CSR format.

Computes ``out = X @ D`` for sparse X (nnz binned into 128x128 tiles, see
``nmf_tpu.ops.sparse_format``) and dense D (n x k), as:

* the D column panel (k x 128) and the out stripe (k x stripe_rows) live in
  VMEM;
* per tile chunk (128 nnz): one ``tpu.dynamic_gather`` along lanes pulls each
  nnz's D column out of the panel, a fused VPU multiply scales by the values,
  and one 128x128 one-hot MXU matmul scatters into the out stripe;
* the out stripe is DMA'd to HBM once per stripe (the output lives in ANY
  memory space so the automatic per-step block write-back is avoided).

The **compact** layout (``TiledSideC``) drives that chunk pipeline: a 1-D
grid over windows of ``group`` chunks covering only *nonempty* tiles;
scalar-prefetched per-window maps pick the D panel and detect stripe
boundaries (accumulator zero/flush), and each chunk's row panel streams
through SMEM (5-bit x 6/word packed when stripe_tiles <= 32 — the
north-star SMEM-budget encoding).  This keeps only real work and tail-chunk
padding — the layout that survives power-law data.  (A dense stripe x panel
grid layout existed through round 3 and was retired: 2.24x slower on-chip.)

Everything is (k on sublanes x 128 lanes) layout; the caller passes D
transposed and transposes the (k x p) result back — two cheap XLA transposes
around the heavy op.

XLA's own sparse paths (BCOO / gather+scatter-add) measure ~95 Mnnz/s on
v5e (docs/sparse_kernel_design.md); this kernel's cost model is one VPU pass
of (k x 128) work per gather/scale plus a 128x128xk MXU op per chunk.

Precision of the one-hot MXU scatter (TPU matmuls are bf16-pass based):
``"highest"``/``"exact"`` = 3-way bf16 split of the scaled operand (exact
f32), ``"high"`` = 2-way split (~2^-16 relative), ``"fast"``/``"default"`` =
single bf16 pass (~1e-3 relative).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..sparse_format import TILE, TiledCSR, TiledSideC

__all__ = ["tiled_matmul_t", "tiled_mm", "tiled_mtm", "tiled_sddmm"]


def _rp_bits_for(stripe_tiles: int, n_entries: int) -> int:
    """rp encoding for ``n_entries`` per-chunk (or per-sub-segment) row
    panels: byte lanes while the operand is comfortably inside the 1 MB
    SMEM scalar-prefetch budget, the 5-bit x 6/word encoding beyond.  The
    5-bit unpack costs one scalar div/mod + dynamic shift per read — free
    under the span-16 north-star chunks it was built for, but measured
    -32% on a small quad store (601 vs 882 Mnnz/s, 40k x 20k powerlaw) —
    so it is applied only when the byte form would not fit."""
    if stripe_tiles > 32:
        return 8
    return 5 if n_entries > 512 * 1024 else 8


def _resolve_precision(precision: str) -> str:
    if precision in ("highest", "exact"):
        return "exact"
    if precision == "high":
        return "high"
    return "fast"


def _gather_wide(dblk, lcol, K, span):
    """Lane-gather each slot's D column out of a (K, span*TILE) panel.
    Mosaic's dynamic_gather table spans one vreg (128 lanes), so wide panels
    decompose into ``span`` sub-gathers + per-slot segment select."""
    if span == 1:
        idx = jnp.broadcast_to(lcol[None, :], (K, TILE))
        return jnp.take_along_axis(dblk, idx, axis=1)
    seg = lcol >> 7
    idx = jnp.broadcast_to((lcol & 127)[None, :], (K, TILE))
    gathered = jnp.zeros((K, TILE), dblk.dtype)
    for s in range(span):
        g = jnp.take_along_axis(dblk[:, s * TILE : (s + 1) * TILE], idx, axis=1)
        gathered = jnp.where((seg == s)[None, :], g, gathered)
    return gathered


def _split_bf16(scaled, precision):
    """bf16 split parts of a scaled f32 operand.  One-hot entries are
    exactly representable in bf16, so summing ``dot(part, onehot)`` over the
    parts recovers: exact f32 (3-way split), ~2^-16 relative (2-way), or
    single-pass bf16 rounding (~1e-3)."""
    if precision == "exact":
        s1 = scaled.astype(jnp.bfloat16)
        r1 = scaled - s1.astype(jnp.float32)
        s2 = r1.astype(jnp.bfloat16)
        s3 = (r1 - s2.astype(jnp.float32)).astype(jnp.bfloat16)
        return (s1, s2, s3)
    if precision == "high":
        s1 = scaled.astype(jnp.bfloat16)
        s2 = (scaled - s1.astype(jnp.float32)).astype(jnp.bfloat16)
        return (s1, s2)
    return (scaled.astype(jnp.bfloat16),)


def _dot_parts(parts, onehot):
    """sum_i parts[i] @ onehot with DEFAULT precision pinned: rounding is
    managed by the manual bf16 splits, and an ambient
    default_matmul_precision("high") context (config.py sets one per solver)
    must not leak in — Mosaic has no HIGH lowering."""
    out = None
    for part in parts:
        c = jax.lax.dot_general(
            part,
            onehot,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT,
        )
        out = c if out is None else out + c
    return out


def _chunk_update(acc_ref, dblk, lrow, lcol, val, rr, K, precision, rp, span=1):
    """One 128-nnz chunk: lane-gather D columns, scale, one-hot MXU scatter
    into the accumulator's row panel ``rp``."""
    gathered = _gather_wide(dblk, lcol, K, span)
    scaled = gathered * val[None, :]
    onehot = (lrow[:, None] == rr).astype(jnp.bfloat16)
    contrib = _dot_parts(_split_bf16(scaled, precision), onehot)
    off = pl.multiple_of(rp * TILE, TILE)
    acc_ref[:, pl.ds(off, TILE)] += contrib


def _read_rp(rp_ref, i, G, t, rp_bits):
    """Per-chunk row panel out of the packed scalar-prefetch words.

    ``rp_bits == 8``: 4 rp bytes per word, window-aligned (G % 4 == 0), so
    ``t % 4`` is static and the unpack is a free scalar shift+mask.
    ``rp_bits == 5``: 6 rp per word packed flat over the global chunk index
    ``i*G + t`` — the SMEM-budget encoding (north-star fix): word and slot
    become dynamic scalars, one div/mod + dynamic shift on the scalar core,
    fully hidden under the chunk's VPU/MXU work."""
    if rp_bits == 8:
        w = rp_ref[i * (G // 4) + t // 4]
        return (w >> (8 * (t % 4))) & 0xFF
    c = i * G + t
    w = rp_ref[c // 6]
    return (w >> (5 * (c % 6))) & 0x1F


def _win_bits(n_stripes, n_colpanels):
    """Bits for the packed (stripe | panel) window word, and whether two
    windows fit one int32 (16 bits each).  The builder's -1 sentinel masks
    to the stripe field's all-ones value, which is never a real stripe id
    (``2**bit_length(n) > n``), so the flush-boundary compare still fires —
    no sign handling needed.  Falls back to the 32-bit stripe<<16|panel
    form when the ids are too wide — whose fields are hard limits: panel
    ids are masked to 16 bits and the stripe rides the upper half of a
    SIGNED int32 (the sentinel needs the arithmetic >> 16), so silently
    exceeding either would gather the wrong D panel with no error."""
    sb = max(int(n_stripes).bit_length(), 1)
    pb = max(int(n_colpanels).bit_length(), 1)
    if sb + pb <= 16:
        return 16, pb
    if pb > 16:
        raise ValueError(
            f"n_colpanels={n_colpanels} exceeds the 16-bit panel field of "
            "the packed window word (> ~8.4M columns per side at span 1); "
            "shard the matrix or widen tail_span"
        )
    if sb > 15:
        raise ValueError(
            f"n_stripes={n_stripes} exceeds the 15-bit stripe field of the "
            "packed window word; raise stripe_tiles or shard the matrix"
        )
    return 32, 16


def _read_win(wm_ref, i, wbits, pbits):
    """(stripe, panel) of window ``i``; 16-bit mode selects a half-word
    dynamically.  The stripe value is only ever compared (boundaries) or
    used as a flush target while real, so the sentinel's masked all-ones
    encoding needs no decode."""
    if wbits == 32:
        w = wm_ref[i]
        return w >> 16, w & 0xFFFF
    h = (wm_ref[i // 2] >> (16 * (i % 2))) & 0xFFFF
    return h >> pbits, h & ((1 << pbits) - 1)


def _make_kernel_compact(G, stripe_width, K, precision: str, span: int = 1,
                         rp_bits: int = 8, wbits: int = 32, pbits: int = 16):
    def kernel(
        win_meta, rp_ref, coords_ref, vals_ref, dt_ref,
        out_hbm, acc_ref, copy_sem,
    ):
        i = pl.program_id(0)
        # packed window words (panel consumed by the index map); the stripe
        # read sign-extends so the sentinel recovers as -1
        s, _ = _read_win(win_meta, i, wbits, pbits)
        prev, _ = _read_win(win_meta, jnp.maximum(i - 1, 0), wbits, pbits)

        @pl.when(jnp.logical_or(i == 0, prev != s))
        def _():
            acc_ref[:] = jnp.zeros_like(acc_ref)

        dblk = dt_ref[:]  # (K, span*TILE)
        rr = jax.lax.broadcasted_iota(jnp.int32, (TILE, TILE), 1)

        if span == 1:
            # unrolled: static chunk slices (no dynamic sublane reads) and
            # VPU/MXU instruction overlap across chunks
            for t in range(G):
                rp = _read_rp(rp_ref, i, G, t, rp_bits)
                c = coords_ref[t, :]
                _chunk_update(
                    acc_ref, dblk, c & 127, c >> 7,
                    vals_ref[t, :], rr, K, precision, rp, span,
                )
        else:
            # wide-span tail chunks: the span-way decomposed gather keeps
            # span (K, TILE) temporaries live per chunk — unrolling all G
            # chunks stacks G*span of them (measured 34 MB > the 16 MB
            # scoped-VMEM budget at span=16, K=256 on the config6 slab), so
            # the chunk loop is sequential here and the stack stays at one
            # chunk's worth
            def tile_body(t, carry):
                rp = _read_rp(rp_ref, i, G, t, rp_bits)
                c = coords_ref[t, :]
                _chunk_update(
                    acc_ref, dblk, c & 127, c >> 7,
                    vals_ref[t, :], rr, K, precision, rp, span,
                )
                return carry

            jax.lax.fori_loop(0, G, tile_body, 0)

        # flush when the next window starts a new stripe (sentinel -1 at end)
        nxt, _ = _read_win(win_meta, i + 1, wbits, pbits)

        @pl.when(nxt != s)
        def _():
            copy = pltpu.make_async_copy(
                acc_ref,
                out_hbm.at[:, pl.ds(s * stripe_width, stripe_width)],
                copy_sem,
            )
            copy.start()
            copy.wait()

    return kernel


def _pack_scalar_meta(chunk_rp, win_panel, win_stripe, G, rp_bits,
                      wbits=32, pbits=16):
    """Build the kernel's two scalar-prefetch operands from the stored
    layout: packed window words and — for the 5-bit encoding — rp repacked
    6 per int32.  Windows pack 2 per word at 16 bits (stripe | panel, the
    sentinel's stripe field all-ones) when both ids fit (_win_bits), else
    one stripe<<16|panel word each.  At the 2Mx200k north-star slab the
    round-3 stored form (4 rp bytes/word + two 32-bit window arrays) was
    1.38 MB of scalar operands vs the 1 MB SMEM budget; this form is
    ~700 KB.  Pure jnp, O(nnz / TILE) elementwise — noise next to the
    matmul it feeds, and loop-invariant in the solver while_loops."""
    if wbits == 32:
        win_meta = (win_stripe.astype(jnp.int32) << 16) | (win_panel & 0xFFFF)
    else:
        smask = (1 << (16 - pbits)) - 1
        half = ((win_stripe.astype(jnp.int32) & smask) << pbits) | (
            win_panel & ((1 << pbits) - 1)
        )
        npadw = -(-half.shape[0] // 2) * 2
        two = jnp.pad(half, (0, npadw - half.shape[0])).reshape(-1, 2)
        win_meta = (two[:, 0] | (two[:, 1] << 16)).astype(jnp.int32)
    flat = chunk_rp.reshape(-1)
    if rp_bits == 8:
        return flat, win_meta
    rp = (
        (flat[:, None] >> (8 * jnp.arange(4, dtype=jnp.int32))) & 0xFF
    ).reshape(-1)
    npad = -(-rp.shape[0] // 6) * 6
    six = jnp.pad(rp, (0, npad - rp.shape[0])).reshape(-1, 6)
    packed = jnp.sum(six << (5 * jnp.arange(6, dtype=jnp.int32)), axis=1)
    return packed.astype(jnp.int32), win_meta


@partial(jax.jit, static_argnames=("meta", "interpret", "precision"))
def _tiled_matmul_compact_impl(
    chunk_rp, win_panel, win_stripe, coords, vals, Dt, meta,
    interpret=False, precision="highest",
):
    (n_stripes, n_colpanels, n_windows, G, stripe_width, p_pad, span) = meta
    K = Dt.shape[0]
    prec = _resolve_precision(precision)
    rp_bits = _rp_bits_for(stripe_width // TILE, n_windows * G)
    wbits, pbits = _win_bits(n_stripes, n_colpanels)
    kernel = _make_kernel_compact(G, stripe_width, K, prec, span, rp_bits,
                                  wbits, pbits)
    rp_packed, win_meta = _pack_scalar_meta(
        chunk_rp, win_panel, win_stripe, G, rp_bits, wbits, pbits
    )

    def dpanel(i, wm, rp):
        return (0, _read_win(wm, i, wbits, pbits)[1])

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_windows,),
        in_specs=[
            pl.BlockSpec(
                (G, TILE), lambda i, wm, rp: (i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (G, TILE), lambda i, wm, rp: (i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (K, span * TILE), dpanel,
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((K, stripe_width), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((K, p_pad), jnp.float32),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        cost_estimate=pl.CostEstimate(
            flops=2 * coords.shape[0] * TILE * TILE * K,
            bytes_accessed=2 * coords.size * 4 + Dt.size * 4 * n_stripes + K * p_pad * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(win_meta, rp_packed, coords, vals, Dt)
    return out


def tiled_matmul_t(side, D, *, interpret: bool = False, precision: str = "highest"):
    """``(X @ D)`` for one tiling orientation; returns (rows, k)."""
    if jax.default_backend() == "cpu":
        # Mosaic only lowers on TPU; use the TPU-semantics interpreter
        interpret = pltpu.InterpretParams()
    p, n = side.rows, side.cols
    k = D.shape[1]
    K = -(-k // 8) * 8  # sublane-align
    stripe_width = side.panels_per_stripe * TILE
    p_pad = side.n_stripes * stripe_width

    Dt = jnp.asarray(D, jnp.float32).T
    n_pad = side.n_colpanels * TILE * getattr(side, "span", 1)
    Dt = jnp.pad(Dt, ((0, K - k), (0, n_pad - Dt.shape[1])))

    meta = (
        side.n_stripes,
        side.n_colpanels,
        side.n_windows,
        side.group,
        stripe_width,
        p_pad,
        side.span,
    )
    out = _tiled_matmul_compact_impl(
        side.chunk_rp,
        side.win_panel,
        side.win_stripe,
        side.coords,
        jnp.asarray(side.vals, jnp.float32),
        Dt,
        meta,
        interpret,
        precision,
    )
    if side.n_dblocks:
        out = out + _tiled_dense_impl(
            side.dblk_rp,
            side.dblk_panel,
            side.dblk_stripe,
            jnp.asarray(side.dvals, jnp.float32),
            Dt,
            (side.n_dblocks, stripe_width, p_pad),
            interpret,
        )
    if side.n_qchunks:
        from ..sparse_format import QUAD_GROUP

        out = out + _tiled_quad_impl(
            side.q_rp,
            side.qwin_panel,
            side.qwin_stripe,
            side.qlrows,
            side.qlcols,
            jnp.asarray(side.qvals, jnp.float32),
            Dt,
            (side.n_qchunks // QUAD_GROUP, QUAD_GROUP, stripe_width,
             p_pad, side.quad_seg, side.n_stripes,
             side.n_colpanels * side.span),
            interpret,
            precision,
        )
    res = out[:k, :p].T
    if getattr(side, "n_coo", 0):
        res = res + _coo_matmul(side, D)
    return res


def _coo_matmul(side, D):
    """The COO dust band's ``X_band @ D`` via XLA's sorted segment-sum — at
    <= coo_tail_nnz nonzeros per 128x128 tile any chunk scheme pads 10-128x,
    while this streams exactly nnz * k values (~50-65 Mnnz/s measured at the
    config6 dust band vs an ~8 Mnnz/s nnz-equivalent on the retired span-16
    path it replaces)."""
    contrib = side.coo_vals[:, None] * jnp.take(
        jnp.asarray(D, jnp.float32), side.coo_cols, axis=0
    )
    return jax.ops.segment_sum(
        contrib, side.coo_rows, num_segments=side.rows, indices_are_sorted=True
    )


def _read_rp_flat(rp_ref, c, rp_bits):
    """Row panel of flat sub-segment index ``c`` out of packed words: byte
    lanes (8-bit) or the 5-bit x 6/word SMEM-budget encoding — the quad
    analogue of ``_read_rp`` (c is dynamic either way here, so both modes
    pay one scalar div/mod)."""
    if rp_bits == 8:
        return (rp_ref[c // 4] >> (8 * (c % 4))) & 0xFF
    return (rp_ref[c // 6] >> (5 * (c % 6))) & 0x1F


def _make_quad_kernel(QG, stripe_width, K, precision: str, seg_size=32,
                      rp_bits=8, wbits=32, pbits=16):
    """Quad-tail chunks: TILE//seg_size small tiles share one 128-slot chunk
    (fixed seg_size-slot sub-segments; same stripe + col panel, one row
    panel each).  One lane gather + one bf16 split serve all sub-segments;
    each sub-segment gets its own masked one-hot MXU scatter into its row
    panel.  Per-chunk metadata is one rp per sub-segment (packed words, see
    ``_read_rp_flat``) — the tail experiments of
    docs/sparse_kernel_design.md round 3 (seg 32 = quad, seg 16 = octa)."""
    nseg = TILE // seg_size

    def kernel(win_meta, rp_ref, lrows_ref, lcols_ref, vals_ref,
               dt_ref, out_hbm, acc_ref, copy_sem):
        i = pl.program_id(0)
        s, _ = _read_win(win_meta, i, wbits, pbits)
        prev, _ = _read_win(win_meta, jnp.maximum(i - 1, 0), wbits, pbits)

        @pl.when(jnp.logical_or(i == 0, prev != s))
        def _():
            acc_ref[:] = jnp.zeros_like(acc_ref)

        dblk = dt_ref[:]  # (K, TILE)
        rr = jax.lax.broadcasted_iota(jnp.int32, (TILE, TILE), 1)
        seg = jax.lax.broadcasted_iota(jnp.int32, (TILE, TILE), 0) // seg_size

        for t in range(QG):
            lrow = lrows_ref[t, :]
            idx = jnp.broadcast_to(lcols_ref[t, :][None, :], (K, TILE))
            gathered = jnp.take_along_axis(dblk, idx, axis=1)
            scaled = gathered * vals_ref[t, :][None, :]
            parts = _split_bf16(scaled, precision)
            eq = lrow[:, None] == rr
            for si in range(nseg):
                rp = _read_rp_flat(rp_ref, (i * QG + t) * nseg + si, rp_bits)
                onehot = (eq & (seg == si)).astype(jnp.bfloat16)
                contrib = _dot_parts(parts, onehot)
                off = pl.multiple_of(rp * TILE, TILE)
                acc_ref[:, pl.ds(off, TILE)] += contrib

        nxt, _ = _read_win(win_meta, i + 1, wbits, pbits)

        @pl.when(nxt != s)
        def _():
            copy = pltpu.make_async_copy(
                acc_ref,
                out_hbm.at[:, pl.ds(s * stripe_width, stripe_width)],
                copy_sem,
            )
            copy.start()
            copy.wait()

    return kernel


@partial(jax.jit, static_argnames=("meta", "interpret", "precision"))
def _tiled_quad_impl(
    q_rp, qwin_panel, qwin_stripe, qlrows, qlcols, qvals, Dt, meta,
    interpret=False, precision="highest",
):
    (nwin_q, QG, stripe_width, p_pad) = meta[:4]
    seg_size = meta[4] if len(meta) > 4 else 32
    n_stripes = meta[5] if len(meta) > 5 else 1 << 14
    n_colpanels = meta[6] if len(meta) > 6 else 1 << 15
    K = Dt.shape[0]
    prec = _resolve_precision(precision)
    rp_bits = _rp_bits_for(stripe_width // TILE,
                           nwin_q * QG * (TILE // seg_size))
    wbits, pbits = _win_bits(n_stripes, n_colpanels)
    kernel = _make_quad_kernel(QG, stripe_width, K, prec, seg_size, rp_bits,
                               wbits, pbits)
    rp_packed, win_meta = _pack_scalar_meta(
        q_rp, qwin_panel, qwin_stripe, QG, rp_bits, wbits, pbits
    )

    def dpanel(i, wm, rp):
        return (0, _read_win(wm, i, wbits, pbits)[1])

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nwin_q,),
        in_specs=[
            pl.BlockSpec(
                (QG, TILE), lambda i, wm, rp: (i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (QG, TILE), lambda i, wm, rp: (i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (QG, TILE), lambda i, wm, rp: (i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (K, TILE), dpanel,
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((K, stripe_width), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((K, p_pad), jnp.float32),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        cost_estimate=pl.CostEstimate(
            flops=2 * qlrows.shape[0] * TILE * TILE * K * 4,
            bytes_accessed=3 * qlrows.size * 4 + Dt.size * 4 + K * p_pad * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(win_meta, rp_packed, qlrows, qlcols, qvals, Dt)


def _make_dense_kernel(G, stripe_width, K):
    """Hybrid dense-tile path: blocks with many nonzeros skip the chunk
    pipeline entirely — one (K x 128) @ (128 x 128) MXU matmul per block into
    the stripe accumulator.  No gathers, no one-hot, no tail padding; exact
    f32 via HIGHEST (6-pass).  G blocks per grid step (same (stripe, panel)
    window, zero-padded) amortize the per-step overhead."""

    def kernel(dwin_panel, dwin_stripe, rp_ref, tiles_ref, dt_ref, out_hbm,
               acc_ref, copy_sem):
        i = pl.program_id(0)
        s = dwin_stripe[i]
        prev = dwin_stripe[jnp.maximum(i - 1, 0)]

        @pl.when(jnp.logical_or(i == 0, prev != s))
        def _():
            acc_ref[:] = jnp.zeros_like(acc_ref)

        dblk = dt_ref[:]  # (K, TILE) column panel of D'
        for t in range(G):
            w = rp_ref[i * (G // 4) + t // 4]
            rp = (w >> (8 * (t % 4))) & 0xFF
            off = pl.multiple_of(rp * TILE, TILE)
            # tile stored (col, row): out_rows += D_panel(K, cols) @ tile
            contrib = jax.lax.dot_general(
                dblk,
                tiles_ref[t],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
            acc_ref[:, pl.ds(off, TILE)] += contrib

        @pl.when(dwin_stripe[i + 1] != s)
        def _():
            copy = pltpu.make_async_copy(
                acc_ref,
                out_hbm.at[:, pl.ds(s * stripe_width, stripe_width)],
                copy_sem,
            )
            copy.start()
            copy.wait()

    return kernel


@partial(jax.jit, static_argnames=("meta", "interpret"))
def _tiled_dense_impl(dblk_rp, dblk_panel, dblk_stripe, dvals, Dt, meta,
                      interpret=False):
    (ndblk, stripe_width, p_pad) = meta
    from ..sparse_format import DENSE_GROUP as DG

    nwin_d = ndblk // DG
    K = Dt.shape[0]
    kernel = _make_dense_kernel(DG, stripe_width, K)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(nwin_d,),
        in_specs=[
            pl.BlockSpec(
                (DG, TILE, TILE), lambda i, dp, dst, dr: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (K, TILE), lambda i, dp, dst, dr: (0, dp[i]),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((K, stripe_width), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((K, p_pad), jnp.float32),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        cost_estimate=pl.CostEstimate(
            flops=2 * ndblk * TILE * TILE * K,
            bytes_accessed=dvals.size * 4 + Dt.size * 4 + K * p_pad * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(dblk_panel, dblk_stripe, dblk_rp.reshape(-1), dvals, Dt)


def _dense_sample(side, Wt, Ht):
    """(W @ H) over every slot of the dense-tile blocks, flattened in the
    dense store's (block, col, row) order — the SDDMM complement of
    ``_tiled_dense_impl``.  One XLA batched matmul; no custom kernel needed.
    Zero-pad blocks produce garbage samples that no perm slot references."""
    from ..sparse_format import DENSE_GROUP as DG

    K = Wt.shape[0]
    pps = side.panels_per_stripe
    words = side.dblk_rp.reshape(-1)
    rp_blk = (
        (words[:, None] >> (8 * jnp.arange(4, dtype=words.dtype))) & 0xFF
    ).reshape(-1)  # (ndblk,)
    stripe_blk = jnp.repeat(side.dblk_stripe[:-1], DG)
    panel_blk = jnp.repeat(side.dblk_panel[:-1], DG)
    rp_panel = stripe_blk * pps + rp_blk
    Wpan = jnp.take(Wt.reshape(K, -1, TILE), rp_panel, axis=1)  # (K, ndblk, rows)
    Hpan = jnp.take(Ht.reshape(K, -1, TILE), panel_blk, axis=1)  # (K, ndblk, cols)
    return jnp.einsum(
        "kbr,kbc->bcr", Wpan, Hpan,
        precision=jax.lax.Precision.HIGHEST,
    ).reshape(-1)


def _make_sddmm_kernel_compact(G, K, span=1, rp_bits=8, wbits=32, pbits=16):
    """SDDMM over the compact chunk layout: per 128-nnz chunk, lane-gather
    the W rows out of the stripe block and the H columns out of the col
    panel, multiply, reduce over sublanes — no scatter, no accumulator,
    exact f32 on the VPU (the MXU is never involved)."""

    def kernel(win_meta, rp_ref, coords_ref, wt_ref,
               ht_ref, out_ref):
        i = pl.program_id(0)
        hblk = ht_ref[:]  # (K, span*TILE) column panel of H

        def chunk(t):
            rp = _read_rp(rp_ref, i, G, t, rp_bits)
            off = pl.multiple_of(rp * TILE, TILE)
            wblk = wt_ref[:, pl.ds(off, TILE)]  # (K, TILE) row panel of W'
            c = coords_ref[t, :]
            idxr = jnp.broadcast_to((c & 127)[None, :], (K, TILE))
            wg = jnp.take_along_axis(wblk, idxr, axis=1)
            hg = _gather_wide(hblk, c >> 7, K, span)
            out_ref[t, :] = jnp.sum(wg * hg, axis=0)

        if span == 1:
            for t in range(G):
                chunk(t)
        else:
            # sequential chunk loop for wide spans — same scoped-VMEM
            # reasoning as the matmul kernel above
            def tile_body(t, carry):
                chunk(t)
                return carry

            jax.lax.fori_loop(0, G, tile_body, 0)

    return kernel


@partial(jax.jit, static_argnames=("meta", "interpret"))
def _tiled_sddmm_compact_impl(
    chunk_rp, win_panel, win_stripe, coords, Wt, Ht, meta, interpret=False
):
    (n_windows, G, stripe_width, span, n_stripes, n_colpanels) = meta
    K = Wt.shape[0]
    rp_bits = _rp_bits_for(stripe_width // TILE, n_windows * G)
    wbits, pbits = _win_bits(n_stripes, n_colpanels)
    kernel = _make_sddmm_kernel_compact(G, K, span, rp_bits, wbits, pbits)
    rp_packed, win_meta = _pack_scalar_meta(
        chunk_rp, win_panel, win_stripe, G, rp_bits, wbits, pbits
    )

    def wstripe(i, wm, rp):
        return (0, _read_win(wm, i, wbits, pbits)[0])

    def dpanel(i, wm, rp):
        return (0, _read_win(wm, i, wbits, pbits)[1])

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_windows,),
        in_specs=[
            pl.BlockSpec(
                (G, TILE), lambda i, wm, rp: (i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (K, stripe_width),
                wstripe,
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (K, span * TILE), dpanel,
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (G, TILE), lambda i, wm, rp: (i, 0), memory_space=pltpu.VMEM
        ),
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_windows * G, TILE), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * coords.size * K,
            bytes_accessed=coords.size * 4 + Wt.size * 4 + Ht.size * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(win_meta, rp_packed, coords, Wt, Ht)


def _make_sddmm_quad_kernel(QG, K, seg_size=32, rp_bits=8, wbits=32, pbits=16):
    """SDDMM over quad-tail chunks: the H-column gather is shared across the
    sub-segments; the W-row gather runs per sub-segment (each has its own
    row panel) and is lane-selected into place."""
    nseg = TILE // seg_size

    def kernel(win_meta, rp_ref, lrows_ref, lcols_ref, wt_ref,
               ht_ref, out_ref):
        i = pl.program_id(0)
        hblk = ht_ref[:]  # (K, TILE)
        seg = jax.lax.broadcasted_iota(jnp.int32, (K, TILE), 1) // seg_size
        for t in range(QG):
            idxr = jnp.broadcast_to(lrows_ref[t, :][None, :], (K, TILE))
            idxc = jnp.broadcast_to(lcols_ref[t, :][None, :], (K, TILE))
            hg = jnp.take_along_axis(hblk, idxc, axis=1)
            wg = jnp.zeros((K, TILE), jnp.float32)
            for si in range(nseg):
                rp = _read_rp_flat(rp_ref, (i * QG + t) * nseg + si, rp_bits)
                off = pl.multiple_of(rp * TILE, TILE)
                wblk = wt_ref[:, pl.ds(off, TILE)]
                wg_si = jnp.take_along_axis(wblk, idxr, axis=1)
                wg = jnp.where(seg == si, wg_si, wg)
            out_ref[t, :] = jnp.sum(wg * hg, axis=0)

    return kernel


@partial(jax.jit, static_argnames=("meta", "interpret"))
def _tiled_sddmm_quad_impl(
    q_rp, qwin_panel, qwin_stripe, qlrows, qlcols, Wt, Ht, meta, interpret=False
):
    (nwin_q, QG, stripe_width) = meta[:3]
    seg_size = meta[3] if len(meta) > 3 else 32
    n_stripes = meta[4] if len(meta) > 4 else 1 << 14
    n_colpanels = meta[5] if len(meta) > 5 else 1 << 15
    K = Wt.shape[0]
    rp_bits = _rp_bits_for(stripe_width // TILE,
                           nwin_q * QG * (TILE // seg_size))
    wbits, pbits = _win_bits(n_stripes, n_colpanels)
    kernel = _make_sddmm_quad_kernel(QG, K, seg_size, rp_bits, wbits, pbits)
    rp_packed, win_meta = _pack_scalar_meta(
        q_rp, qwin_panel, qwin_stripe, QG, rp_bits, wbits, pbits
    )

    def wstripe(i, wm, rp):
        return (0, _read_win(wm, i, wbits, pbits)[0])

    def dpanel(i, wm, rp):
        return (0, _read_win(wm, i, wbits, pbits)[1])

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nwin_q,),
        in_specs=[
            pl.BlockSpec(
                (QG, TILE), lambda i, wm, rp: (i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (QG, TILE), lambda i, wm, rp: (i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (K, stripe_width),
                wstripe,
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (K, TILE), dpanel,
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (QG, TILE), lambda i, wm, rp: (i, 0), memory_space=pltpu.VMEM
        ),
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nwin_q * QG, TILE), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * qlrows.size * K * 4,
            bytes_accessed=2 * qlrows.size * 4 + Wt.size * 4 + Ht.size * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(win_meta, rp_packed, qlrows, qlcols, Wt, Ht)


def tiled_sddmm(X: TiledCSR, W, H, *, interpret: bool = False):
    """Values of ``(W @ H)`` sampled at X's nonzeros, (nnz,) in CSR order
    (the per-nnz seam behind the divergence updater's quotient,
    reference src/multupd.jl:170-192).  Compact-layout fwd side only —
    callers fall back to the jnp gather form otherwise."""
    if jax.default_backend() == "cpu":
        interpret = pltpu.InterpretParams()
    side = X.fwd
    if not isinstance(side, TiledSideC):
        raise TypeError("tiled_sddmm requires the compact layout")
    if X.row_perm is not None:
        W = jnp.take(W, X.row_perm, axis=0)
    if X.col_perm is not None:
        H = jnp.take(H, X.col_perm, axis=1)
    k = W.shape[1]
    K = -(-k // 8) * 8
    stripe_width = side.panels_per_stripe * TILE
    p_pad = side.n_stripes * stripe_width
    n_pad = side.n_colpanels * TILE * side.span
    Wt = jnp.pad(jnp.asarray(W, jnp.float32).T, ((0, K - k), (0, p_pad - W.shape[0])))
    Ht = jnp.pad(jnp.asarray(H, jnp.float32), ((0, K - k), (0, n_pad - H.shape[1])))
    meta = (side.n_windows, side.group, stripe_width, side.span,
            side.n_stripes, side.n_colpanels)
    out = _tiled_sddmm_compact_impl(
        side.chunk_rp, side.win_panel, side.win_stripe, side.coords,
        Wt, Ht, meta, interpret,
    )
    flat = out.reshape(-1)
    if side.n_dblocks:
        flat = jnp.concatenate([flat, _dense_sample(side, Wt, Ht)])
    if getattr(side, "n_qchunks", 0):
        from ..sparse_format import QUAD_GROUP

        qout = _tiled_sddmm_quad_impl(
            side.q_rp, side.qwin_panel, side.qwin_stripe, side.qlrows,
            side.qlcols, Wt, Ht,
            (side.n_qchunks // QUAD_GROUP, QUAD_GROUP, stripe_width,
             getattr(side, "quad_seg", 32), side.n_stripes,
             side.n_colpanels * side.span),
            interpret,
        )
        flat = jnp.concatenate([flat, qout.reshape(-1)])
    if getattr(side, "n_coo", 0):
        csamp = jnp.sum(
            jnp.take(jnp.asarray(W, jnp.float32), side.coo_rows, axis=0)
            * jnp.take(jnp.asarray(H, jnp.float32), side.coo_cols, axis=1).T,
            axis=1,
        )
        flat = jnp.concatenate([flat, csamp])
    return jnp.take(flat, side.perm).astype(W.dtype)


def tiled_mm(X: TiledCSR, D, *, interpret: bool = False, precision: str = "highest"):
    """``X @ D`` (p x k).  Degree-ordered tilings gather D's rows into the
    renumbered coordinates and scatter the output back (see build_tiled)."""
    if X.col_perm is not None:
        D = jnp.take(D, X.col_perm, axis=0)
    out = tiled_matmul_t(X.fwd, D, interpret=interpret, precision=precision)
    if X.row_rank is not None:
        out = jnp.take(out, X.row_rank, axis=0)
    return out


def tiled_mtm(X: TiledCSR, D, *, interpret: bool = False, precision: str = "highest"):
    """``X.T @ D`` (n x k)."""
    if X.row_perm is not None:
        D = jnp.take(D, X.row_perm, axis=0)
    out = tiled_matmul_t(X.bwd, D, interpret=interpret, precision=precision)
    if X.col_rank is not None:
        out = jnp.take(out, X.col_rank, axis=0)
    return out
