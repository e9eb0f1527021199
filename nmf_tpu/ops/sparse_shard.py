"""Sharded tiled-CSR: the multi-chip sparse matmul path.

2-D decomposition matching the canonical dense layout (X: P(rows, cols)):
device (i, j) owns the nonzeros whose row falls in row-block i and column in
col-block j, stored in *local* coordinates as a compact TiledSideC (the
measured-fastest single-chip layout, incl. the hybrid dense-tile /
quad-tail stores and per-block degree renumbering).

* ``X @ D``  (p x k): D is row-sharded over the mesh "cols" axis (each device
  holds exactly its column panels), every device runs the single-chip Pallas
  kernel on its local tiles, partial results are ``psum``-reduced over
  "cols" — the output lands row-sharded, i.e. exactly the canonical W
  sharding ``P("rows", None)``.
* ``X' @ D`` (n x k): the same with the transposed tiling — D sharded over
  "rows" (canonical W layout), psum over "rows", output in the canonical
  H' layout ``P("cols", None)``.

So each HALS/MU sweep on sparse X needs zero resharding of the factors: the
sparse products consume and produce the factor shardings the dense path
already uses.  Collectives: one (local_rows x k) psum per product.

All devices' local tile arrays are padded to a uniform shape so the stacked
global array is jit/shard_map friendly; empty-device blocks run zero chunks.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.common import data_field, static_field
from ..parallel.mesh import COLS, ROWS
from .sparse_format import (
    DENSE_GROUP,
    QUAD_GROUP,
    TILE,
    TiledSideC,
    _build_side_compact,
)

__all__ = [
    "ShardedTiled",
    "shard_tiled",
    "sharded_mm",
    "sharded_mtm",
    "sharded_sddmm",
    "sharded_scale_values",
    "sharded_nnz_values",
    "sharded_col_ids",
    "sharded_colsums",
    "sharded_rowsums",
    "sharded_load_stats",
]


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class _ShardedSideC:
    """Per-device compact TiledSideCs for one orientation (the round-2
    single-chip layout: nonempty-tile chunks + scalar-prefetched window maps
    + optional hybrid dense-tile and quad-tail stores), as global sharded
    arrays with leading (R, C) device axes.

    Every device block is padded to the same static sizes (``n_windows``,
    ``n_dblocks``, ``n_qchunks``): padding windows are appended *before* the
    sentinel with the last stripe id (the builder's per-stripe coverage
    guarantees that is ``n_stripes - 1``) and all-zero chunks, so they
    zero-add into the already-open accumulator run and the sentinel still
    performs the final flush.  Blocks with no dense/quad tiles at all carry
    a minimal all-zero store with one window per stripe (the same coverage
    trick the single-chip builder uses for missing stripes).
    """

    # (R, C, nchunks, TILE) int32: packed slot coords lcol<<7|lrow
    coords: jax.Array = data_field()
    vals: jax.Array = data_field()
    chunk_rp: jax.Array = data_field()  # (R, C, nwin, group//4) int32 packed
    win_panel: jax.Array = data_field()  # (R, C, nwin+1) int32
    win_stripe: jax.Array = data_field()  # (R, C, nwin+1) int32, -1 sentinel
    n_stripes: int = static_field(default=1)
    n_colpanels: int = static_field(default=1)
    n_windows: int = static_field(default=1)
    group: int = static_field(default=16)
    panels_per_stripe: int = static_field(default=1)  # stripe_tiles
    local_rows: int = static_field(default=0)  # padded local row count
    local_cols: int = static_field(default=0)
    # hybrid dense-tile store (all-None when dense_tile_nnz was not set)
    dvals: jax.Array | None = data_field(default=None)  # (R, C, ndblk, TILE, TILE)
    dblk_panel: jax.Array | None = data_field(default=None)  # (R, C, nwin_d+1)
    dblk_stripe: jax.Array | None = data_field(default=None)
    dblk_rp: jax.Array | None = data_field(default=None)  # (R, C, nwin_d, DG//4)
    n_dblocks: int = static_field(default=0)
    # quad-tail store (all-None when quad_tail_nnz was not set)
    qvals: jax.Array | None = data_field(default=None)  # (R, C, nq, TILE)
    qlrows: jax.Array | None = data_field(default=None)
    qlcols: jax.Array | None = data_field(default=None)
    # (R, C, nwin_q, QG * (TILE//quad_seg)//4) packed rp words
    q_rp: jax.Array | None = data_field(default=None)
    qwin_panel: jax.Array | None = data_field(default=None)  # (R, C, nwin_q+1)
    qwin_stripe: jax.Array | None = data_field(default=None)
    n_qchunks: int = static_field(default=0)
    quad_seg: int = static_field(default=32)  # sub-segment width (32 | 16)
    # COO dust band (round 5, mirrors TiledSideC): per-device row-sorted
    # local coordinates, padding entries repeat the last real row with
    # value 0 (keeps segment_sum's sorted contract and adds nothing)
    coo_rows: jax.Array | None = data_field(default=None)  # (R, C, ncoo)
    coo_cols: jax.Array | None = data_field(default=None)
    coo_vals: jax.Array | None = data_field(default=None)
    n_coo: int = static_field(default=0)

    @property
    def n_slots(self) -> int:
        """Flat per-device slot count of the value layout: chunk slots,
        then dense-block elements ((col, row) within block), then quad
        slots, then COO band entries — the same region order as
        ``TiledSideC``'s perm/inv."""
        return (
            self.coords.shape[2] * TILE
            + self.n_dblocks * TILE * TILE
            + self.n_qchunks * TILE
            + self.n_coo
        )


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class ShardedTiled:
    """2-D sharded sparse matrix for the mesh-parallel kernel.

    ``stats`` = (sum, sum of squares, min) of the values — enough for
    validation, mean() and the Gram-identity MSE objective without keeping
    the raw COO on every host.  ``transposed`` flips the orientation
    logically (``transpose()`` is free).
    """

    fwd: _ShardedSideC = data_field()
    bwd: _ShardedSideC = data_field()
    stats: jax.Array = data_field(default=None)
    # (C, R, bwd_slots) int32: for each bwd chunk slot, the fwd chunk slot
    # holding the same nonzero (out-of-range = padding).  Lets per-nnz value
    # updates propagate fwd -> bwd with one local gather per device.
    b2f: jax.Array | None = data_field(default=None)
    shape: tuple[int, int] = static_field(default=(0, 0))
    mesh_shape: tuple[int, int] = static_field(default=(1, 1))
    transposed: bool = static_field(default=False)
    mesh: Mesh | None = static_field(default=None)
    # Per-block degree renumbering (order="degree"; all None for natural
    # order).  Row-block i's local rows are renumbered by descending degree
    # over the WHOLE block row (consistent across mesh columns, so psum
    # partials align); same per column block.  ``*_perm[renumbered] =
    # original local id``, ``*_rank[original] = renumbered``.  The factor
    # gathers that bridge the orderings are device-local: the kernel's D
    # operand is gathered through perm on the way in and its output through
    # rank on the way out — zero extra collectives.
    row_perm: jax.Array | None = data_field(default=None)  # (R, local_p) int32
    row_rank: jax.Array | None = data_field(default=None)
    col_perm: jax.Array | None = data_field(default=None)  # (C, local_n) int32
    col_rank: jax.Array | None = data_field(default=None)
    # exact per-block pattern nnz ((R, C) nested tuple, agreed at build):
    # closes the explicit-zero caveat of sharded_load_stats — value!=0
    # counts undercount patterns with stored zeros
    block_nnz: tuple | None = static_field(default=None)

    @property
    def dtype(self):
        return self.fwd.vals.dtype

    @property
    def ndim(self):
        return 2

    def transpose(self):
        return dataclasses.replace(
            self,
            shape=(self.shape[1], self.shape[0]),
            transposed=not self.transposed,
        )


def _zero_dense_store(n_stripes, nblk_win, blk_shape):
    """Minimal valid all-zero windowed store: one window per stripe (the
    flush-coverage requirement), ``nblk_win`` zero blocks each."""
    nw = n_stripes
    blocks = np.zeros((nw * nblk_win,) + blk_shape, np.float32)
    panel = np.append(np.zeros(nw, np.int32), 0).astype(np.int32)
    stripe = np.append(np.arange(nw, dtype=np.int32), -1).astype(np.int32)
    return nw, blocks, panel, stripe


def _pad_windows(panel, stripe, nwin0, add):
    """Append ``add`` padding windows before the sentinel, repeating the last
    real window's stripe (coverage makes it ``n_stripes - 1``) at panel 0 —
    they zero-add into the open accumulator run; the sentinel still flushes."""
    last = stripe[nwin0 - 1]
    panel = np.concatenate(
        [panel[:nwin0], np.zeros(add, np.int32), panel[nwin0:]]
    ).astype(np.int32)
    stripe = np.concatenate(
        [stripe[:nwin0], np.full(add, last, np.int32), stripe[nwin0:]]
    ).astype(np.int32)
    return panel, stripe


def _pad_compact_block(s: TiledSideC, nwin_t: int, nwin_d_t: int,
                       nwin_q_t: int, quad_seg: int = 32, ncoo_t: int = 0):
    """Pad one device block's compact side to the uniform window counts.
    Returns a dict of numpy arrays (the assembled global array's block) plus
    the perm remapped to the padded flat slot layout."""
    group = s.group
    DG, QG = DENSE_GROUP, QUAD_GROUP
    out = {}

    co, vv = np.asarray(s.coords), np.asarray(s.vals)
    rp = np.asarray(s.chunk_rp)
    wp, ws = np.asarray(s.win_panel), np.asarray(s.win_stripe)
    add = nwin_t - s.n_windows
    if add:
        co = np.concatenate([co, np.zeros((add * group, TILE), np.int32)])
        vv = np.concatenate([vv, np.zeros((add * group, TILE), np.float32)])
        rp = np.concatenate([rp, np.zeros((add, group // 4), np.int32)])
        wp, ws = _pad_windows(wp, ws, s.n_windows, add)
    out.update(coords=co, vals=vv, chunk_rp=rp, win_panel=wp,
               win_stripe=ws)

    if nwin_d_t:
        if s.n_dblocks:
            nwd0 = s.n_dblocks // DG
            dv = np.asarray(s.dvals)
            dp, dstr = np.asarray(s.dblk_panel), np.asarray(s.dblk_stripe)
            drp = np.asarray(s.dblk_rp)
        else:
            nwd0, dv, dp, dstr = _zero_dense_store(
                s.n_stripes, DG, (TILE, TILE)
            )
            drp = np.zeros((nwd0, DG // 4), np.int32)
        addd = nwin_d_t - nwd0
        if addd:
            dv = np.concatenate(
                [dv, np.zeros((addd * DG, TILE, TILE), np.float32)]
            )
            drp = np.concatenate([drp, np.zeros((addd, DG // 4), np.int32)])
            dp, dstr = _pad_windows(dp, dstr, nwd0, addd)
        out.update(dvals=dv, dblk_panel=dp, dblk_stripe=dstr, dblk_rp=drp)

    if nwin_q_t:
        nwords = (TILE // quad_seg) // 4  # packed rp words per chunk
        if s.n_qchunks:
            nwq0 = s.n_qchunks // QG
            qv = np.asarray(s.qvals)
            qlr, qlc = np.asarray(s.qlrows), np.asarray(s.qlcols)
            qrp = np.asarray(s.q_rp)
            qp, qs = np.asarray(s.qwin_panel), np.asarray(s.qwin_stripe)
        else:
            nwq0, qv, qp, qs = _zero_dense_store(s.n_stripes, QG, (TILE,))
            qlr = np.zeros((nwq0 * QG, TILE), np.int32)
            qlc = np.zeros((nwq0 * QG, TILE), np.int32)
            qrp = np.zeros((nwq0, QG * nwords), np.int32)
        addq = nwin_q_t - nwq0
        if addq:
            qv = np.concatenate([qv, np.zeros((addq * QG, TILE), np.float32)])
            qlr = np.concatenate([qlr, np.zeros((addq * QG, TILE), np.int32)])
            qlc = np.concatenate([qlc, np.zeros((addq * QG, TILE), np.int32)])
            qrp = np.concatenate([qrp, np.zeros((addq, QG * nwords), np.int32)])
            qp, qs = _pad_windows(qp, qs, nwq0, addq)
        out.update(qvals=qv, qlrows=qlr, qlcols=qlc, q_rp=qrp,
                   qwin_panel=qp, qwin_stripe=qs)

    if ncoo_t:
        ncoo0 = s.n_coo
        if ncoo0:
            cr = np.asarray(s.coo_rows)
            cc = np.asarray(s.coo_cols)
            cv = np.asarray(s.coo_vals)
        else:
            cr = cc = np.zeros(0, np.int32)
            cv = np.zeros(0, np.float32)
        addc = ncoo_t - ncoo0
        if addc:
            # repeat the last real row (or 0) so the per-device band stays
            # row-sorted for segment_sum; value 0 adds nothing
            lastr = cr[-1] if ncoo0 else np.int32(0)
            cr = np.concatenate([cr, np.full(addc, lastr, np.int32)])
            cc = np.concatenate([cc, np.zeros(addc, np.int32)])
            cv = np.concatenate([cv, np.zeros(addc, np.float32)])
        out.update(coo_rows=cr, coo_cols=cc, coo_vals=cv)

    # remap perm into the padded flat slot space (chunk slots keep their
    # indices — padding only appends; dense/quad/coo regions shift by the
    # grown earlier regions)
    old_chunk = s.n_windows * group * TILE
    old_dense = s.n_dblocks * TILE * TILE
    old_quad = s.n_qchunks * TILE
    new_chunk = nwin_t * group * TILE
    new_dense = nwin_d_t * DG * TILE * TILE
    new_quad = nwin_q_t * QG * TILE
    perm = np.asarray(s.perm).copy()
    in_dense = (perm >= old_chunk) & (perm < old_chunk + old_dense)
    in_quad = (perm >= old_chunk + old_dense) & (
        perm < old_chunk + old_dense + old_quad
    )
    in_coo = perm >= old_chunk + old_dense + old_quad
    perm[in_dense] += new_chunk - old_chunk
    perm[in_quad] += (new_chunk - old_chunk) + (new_dense - old_dense)
    perm[in_coo] += (
        (new_chunk - old_chunk) + (new_dense - old_dense)
        + (new_quad - old_quad)
    )
    out["perm"] = perm
    out["n_slots"] = new_chunk + new_dense + new_quad + ncoo_t
    return out


def _assemble_compact(mesh, R, C, fwd_blocks, bwd_blocks, targets,
                      local_p, local_n):
    """Pad every owned block to the agreed window counts, build the per-device
    bwd->fwd slot maps, and assemble the global sharded arrays for both
    orientations of the compact layout."""
    nwin_f, nwd_f, nwq_f, ncoo_f, nwin_b, nwd_b, nwq_b, ncoo_b = targets
    b0f = next(iter(fwd_blocks.values()))
    b0b = next(iter(bwd_blocks.values()))
    qseg = b0f.quad_seg
    padded_f = {
        k: _pad_compact_block(s, nwin_f, nwd_f, nwq_f, qseg, ncoo_f)
        for k, s in fwd_blocks.items()
    }
    padded_b = {
        k: _pad_compact_block(s, nwin_b, nwd_b, nwq_b, qseg, ncoo_b)
        for k, s in bwd_blocks.items()
    }
    Sf = next(iter(padded_f.values()))["n_slots"]
    Sb = next(iter(padded_b.values()))["n_slots"]
    if max(Sf, Sb) >= 2**31:
        raise ValueError(
            "compact device block exceeds int32 slot space; use more devices"
        )
    b2f_blocks = {}
    for k in padded_f:
        m = np.full(Sb, Sf, np.int32)
        m[padded_b[k]["perm"]] = padded_f[k]["perm"]
        b2f_blocks[k] = m

    def asm(padded, name, fwd_lead, key_fn):
        blk0 = padded[next(iter(padded))][name]
        lead = (R, C) if fwd_lead else (C, R)
        axes = (ROWS, COLS) if fwd_lead else (COLS, ROWS)
        spec = P(*axes, *([None] * blk0.ndim))
        return _assemble(
            mesh, spec, lead + blk0.shape,
            {k: v[name] for k, v in padded.items()}, key_fn,
        )

    def make_side(padded, src, nwin, nwd, nwq, ncoo, fwd_lead, key_fn, lp, ln):
        a = lambda name: asm(padded, name, fwd_lead, key_fn)
        return _ShardedSideC(
            a("coords"), a("vals"), a("chunk_rp"),
            a("win_panel"), a("win_stripe"),
            n_stripes=src.n_stripes,
            n_colpanels=src.n_colpanels,
            n_windows=nwin,
            group=src.group,
            panels_per_stripe=src.panels_per_stripe,
            local_rows=lp,
            local_cols=ln,
            dvals=a("dvals") if nwd else None,
            dblk_panel=a("dblk_panel") if nwd else None,
            dblk_stripe=a("dblk_stripe") if nwd else None,
            dblk_rp=a("dblk_rp") if nwd else None,
            n_dblocks=nwd * DENSE_GROUP,
            qvals=a("qvals") if nwq else None,
            qlrows=a("qlrows") if nwq else None,
            qlcols=a("qlcols") if nwq else None,
            q_rp=a("q_rp") if nwq else None,
            qwin_panel=a("qwin_panel") if nwq else None,
            qwin_stripe=a("qwin_stripe") if nwq else None,
            n_qchunks=nwq * QUAD_GROUP,
            quad_seg=src.quad_seg,
            coo_rows=a("coo_rows") if ncoo else None,
            coo_cols=a("coo_cols") if ncoo else None,
            coo_vals=a("coo_vals") if ncoo else None,
            n_coo=ncoo,
        )

    fwd = make_side(padded_f, b0f, nwin_f, nwd_f, nwq_f, ncoo_f, True,
                    _fwd_key, local_p, local_n)
    bwd = make_side(padded_b, b0b, nwin_b, nwd_b, nwq_b, ncoo_b, False,
                    _bwd_key, local_n, local_p)
    b2f = _assemble(mesh, P(COLS, ROWS, None), (C, R, Sb), b2f_blocks,
                    _bwd_key)
    return fwd, bwd, b2f


def _assemble(mesh, spec, global_shape, blocks, key_fn):
    """Global sharded array from per-block host arrays this process owns.
    ``blocks[(i, j)]`` is the (i, j) device block WITHOUT the two leading
    unit dims; ``key_fn(index)`` maps a shard index to the (i, j) key."""

    def cb(index):
        return blocks[key_fn(index)][None, None]

    return jax.make_array_from_callback(
        global_shape, NamedSharding(mesh, spec), cb
    )


def _asm_perm(mesh, axis, blk):
    """(N, L) per-mesh-row (or -column) permutation table, sharded over
    ``axis`` and replicated along the other mesh axis.  Every process
    computes the full table (degrees are globally agreed), so any shard can
    be served locally."""

    def cb(index):
        return blk[index[0].start or 0][None]

    return jax.make_array_from_callback(
        blk.shape, NamedSharding(mesh, P(axis, None)), cb
    )


def _fwd_key(index):
    return (index[0].start or 0, index[1].start or 0)


def _bwd_key(index):
    return (index[1].start or 0, index[0].start or 0)


def shard_tiled(
    rows, cols, vals, shape, mesh: Mesh, *, stripe_tiles: int = 32,
    local: bool = False, layout: str = "compact", group: int = 16,
    dense_tile_nnz: int | None = None, quad_tail_nnz: int | None = None,
    quad_seg: int = 32, order: str = "degree",
    coo_tail_nnz: int | None = None,
) -> ShardedTiled:
    """Build the 2-D sharded tiling from COO data for ``mesh``.

    **Process-local**: each process bins and materializes ONLY the (row-block,
    col-block) tiles owned by its own devices — at the 10M x 1M scale no host
    ever holds the whole matrix.  Cross-process coordination is two tiny
    allgathers (the uniform padding bounds and the value stats); the
    global arrays are assembled with ``jax.make_array_from_callback``.

    ``local=False`` (default): every process passes the FULL COO and keeps
    its share (convenient single-host path).  ``local=True``: each process
    passes only its own nonzeros (e.g. from its input-file shard); entries
    that belong to another process's blocks raise.

    Each device block is stored in the compact layout (nonempty-tile
    chunks, scalar-prefetched window maps) — the measured-fastest
    single-chip layout; ``dense_tile_nnz`` / ``quad_tail_nnz`` enable its
    hybrid dense-tile and quad-tail stores per block.  (The round-1
    ``layout="grid"`` was retired: 2.24x slower on-chip.)

    ``order="degree"`` (default) renumbers each block row's local rows (and
    block column's local cols) by descending degree over the whole block
    row/column, so power-law heads pack into dense tiles exactly like the
    single-chip degree sort — the orderings are per-mesh-row /
    per-mesh-column consistent, so the psum partials align and the factor
    perm gathers stay device-local.  ``order="natural"`` keeps original
    coordinates.
    """
    p, n = shape
    R = mesh.shape[ROWS]
    C = mesh.shape[COLS]
    if layout != "compact":
        raise ValueError(
            f"layout={layout!r} is not supported: the 'grid' layout was "
            "retired (compact measured 2.24x faster on-chip, round 3)"
        )
    if order not in ("degree", "natural"):
        raise ValueError("order must be 'degree' or 'natural'")
    rows = np.asarray(rows, np.int32)
    cols = np.asarray(cols, np.int32)
    vals = np.asarray(vals, np.float32)
    # pad global dims so each device block is a whole number of tiles
    local_p = -(-(-(-p // R)) // TILE) * TILE  # ceil(p/R) rounded up to TILE
    local_n = -(-(-(-n // C)) // TILE) * TILE

    multiproc = jax.process_count() > 1
    pid = jax.process_index()
    dev_grid = np.asarray(mesh.devices)
    owned = [
        (i, j)
        for i in range(R)
        for j in range(C)
        if (not multiproc) or dev_grid[i, j].process_index == pid
    ]

    # per-block degree renumbering: degrees over the whole block row/column
    # so every device in a mesh row/column agrees on the ordering
    if order == "degree":
        rdeg = np.bincount(rows, minlength=local_p * R).astype(np.int64)
        cdeg = np.bincount(cols, minlength=local_n * C).astype(np.int64)
        if multiproc and local:
            from jax.experimental import multihost_utils

            g = multihost_utils.process_allgather(
                np.concatenate([rdeg, cdeg])
            ).reshape(-1, len(rdeg) + len(cdeg)).sum(axis=0)
            rdeg, cdeg = g[: len(rdeg)], g[len(rdeg):]
        row_perm_blk = np.stack([
            np.argsort(-rdeg[i * local_p:(i + 1) * local_p], kind="stable")
            for i in range(R)
        ]).astype(np.int32)
        col_perm_blk = np.stack([
            np.argsort(-cdeg[j * local_n:(j + 1) * local_n], kind="stable")
            for j in range(C)
        ]).astype(np.int32)
        row_rank_blk = np.empty_like(row_perm_blk)
        col_rank_blk = np.empty_like(col_perm_blk)
        ar_p, ar_n = np.arange(local_p, dtype=np.int32), np.arange(local_n, dtype=np.int32)
        for i in range(R):
            row_rank_blk[i, row_perm_blk[i]] = ar_p
        for j in range(C):
            col_rank_blk[j, col_perm_blk[j]] = ar_n
    else:
        row_perm_blk = col_perm_blk = row_rank_blk = col_rank_blk = None

    bi = rows // local_p
    bj = cols // local_n
    covered = np.zeros(len(rows), bool)
    fwd_blocks, bwd_blocks = {}, {}
    block_nnz = np.zeros((R, C), np.int64)
    for (i, j) in owned:
        m = (bi == i) & (bj == j)
        covered |= m
        lr = rows[m] - i * local_p
        lc = cols[m] - j * local_n
        if order == "degree":
            lr = row_rank_blk[i][lr]
            lc = col_rank_blk[j][lc]
        fwd_blocks[(i, j)] = _build_side_compact(
            lr, lc, vals[m],
            local_p, local_n, stripe_tiles, group, dense_tile_nnz,
            1, quad_tail_nnz, quad_seg, coo_tail_nnz,
        )
        bwd_blocks[(i, j)] = _build_side_compact(
            lc, lr, vals[m],
            local_n, local_p, stripe_tiles, group, dense_tile_nnz,
            1, quad_tail_nnz, quad_seg, coo_tail_nnz,
        )
        block_nnz[i, j] = int(m.sum())
    if local and not covered.all():
        raise ValueError(
            "local=True: some nonzeros fall in blocks owned by other "
            "processes; pass each process only its own entries."
        )

    # uniform padding bounds + value stats: the only cross-process agreement
    pads_local = np.asarray(
        [
            max(s.n_windows for s in fwd_blocks.values()),
            max(s.n_dblocks // DENSE_GROUP for s in fwd_blocks.values()),
            max(s.n_qchunks // QUAD_GROUP for s in fwd_blocks.values()),
            max(s.n_coo for s in fwd_blocks.values()),
            max(s.n_windows for s in bwd_blocks.values()),
            max(s.n_dblocks // DENSE_GROUP for s in bwd_blocks.values()),
            max(s.n_qchunks // QUAD_GROUP for s in bwd_blocks.values()),
            max(s.n_coo for s in bwd_blocks.values()),
        ],
        np.int64,
    )
    # exact per-block pattern nnz rides the same agreement (each block is
    # owned by exactly one process, so elementwise max assembles the grid)
    pads_local = np.concatenate([pads_local, block_nnz.reshape(-1)])
    ov = vals[covered] if multiproc else vals
    stats_local = np.asarray(
        [ov.sum(dtype=np.float64), (ov.astype(np.float64) ** 2).sum(),
         ov.min() if len(ov) else np.inf],
        np.float64,
    )
    if multiproc:
        from jax.experimental import multihost_utils

        g = multihost_utils.process_allgather(pads_local)
        pads_local = g.reshape(-1, len(pads_local)).max(axis=0)
        sg = multihost_utils.process_allgather(stats_local)
        stats_local = np.asarray(
            [sg[..., 0].sum(), sg[..., 1].sum(), sg[..., 2].min()]
        )
    if not np.isfinite(stats_local[2]):
        stats_local[2] = 0.0
    stats = jnp.asarray(stats_local, jnp.float32)

    fwd, bwd, b2f = _assemble_compact(
        mesh, R, C, fwd_blocks, bwd_blocks,
        tuple(int(v) for v in pads_local[:8]), local_p, local_n,
    )
    block_nnz_t = tuple(
        tuple(int(v) for v in row)
        for row in pads_local[8:].reshape(R, C)
    )
    if order == "degree":
        perms = dict(
            row_perm=_asm_perm(mesh, ROWS, row_perm_blk),
            row_rank=_asm_perm(mesh, ROWS, row_rank_blk),
            col_perm=_asm_perm(mesh, COLS, col_perm_blk),
            col_rank=_asm_perm(mesh, COLS, col_rank_blk),
        )
    else:
        perms = {}
    return ShardedTiled(
        fwd, bwd, stats, b2f, (p, n), (R, C), False, mesh,
        block_nnz=block_nnz_t, **perms
    )


def _compact_operand_names(side: _ShardedSideC):
    names = ["coords", "vals", "chunk_rp", "win_panel", "win_stripe"]
    if side.n_dblocks:
        names += ["dvals", "dblk_panel", "dblk_stripe", "dblk_rp"]
    if side.n_qchunks:
        names += ["qvals", "qlrows", "qlcols", "q_rp", "qwin_panel",
                  "qwin_stripe"]
    if side.n_coo:
        names += ["coo_rows", "coo_cols", "coo_vals"]
    return names


def _local_matmul_compact(side: _ShardedSideC, a: dict, Dt_local, precision):
    """Per-device ``X_block @ D_local`` on the compact layout — the same
    three kernels the single-chip path runs (chunk windows + hybrid dense
    blocks + quad-tail chunks)."""
    if jax.default_backend() == "cpu":
        return _local_matmul_jnp_compact(side, a, Dt_local)
    from .pallas.sparse import (
        _tiled_dense_impl,
        _tiled_matmul_compact_impl,
        _tiled_quad_impl,
    )

    stripe_width = side.panels_per_stripe * TILE
    p_pad = side.n_stripes * stripe_width
    meta = (side.n_stripes, side.n_colpanels, side.n_windows, side.group,
            stripe_width, p_pad, 1)
    out = _tiled_matmul_compact_impl(
        a["chunk_rp"], a["win_panel"], a["win_stripe"],
        a["coords"], a["vals"], Dt_local, meta, False, precision,
    )
    if side.n_dblocks:
        out = out + _tiled_dense_impl(
            a["dblk_rp"], a["dblk_panel"], a["dblk_stripe"], a["dvals"],
            Dt_local, (side.n_dblocks, stripe_width, p_pad), False,
        )
    if side.n_qchunks:
        out = out + _tiled_quad_impl(
            a["q_rp"], a["qwin_panel"], a["qwin_stripe"],
            a["qlrows"], a["qlcols"], a["qvals"], Dt_local,
            (side.n_qchunks // QUAD_GROUP, QUAD_GROUP, stripe_width, p_pad,
             side.quad_seg, side.n_stripes, side.n_colpanels),
            False, precision,
        )
    if side.n_coo:
        out = out + _local_coo_matmul(side, a, Dt_local, p_pad)
    return out


def _local_coo_matmul(side: _ShardedSideC, a: dict, Dt_local, p_pad):
    """Per-device COO dust band: gather D columns, scale, sorted
    segment-sum over local rows — the sharded twin of the single-chip
    ``_coo_matmul`` (padding entries repeat a real row with value 0)."""
    contrib = (
        jnp.take(Dt_local, a["coo_cols"], axis=1) * a["coo_vals"][None, :]
    )
    seg = jax.ops.segment_sum(
        contrib.T, a["coo_rows"], num_segments=p_pad,
        indices_are_sorted=True,
    )
    return seg.T


def _slot_coords_compact(side: _ShardedSideC, a: dict):
    """(local row, local col) per slot of the flat compact value layout
    (chunk slots, then dense-block elements in (col, row) order, then quad
    slots, then COO band entries).  Padding slots get in-range coords; their
    value is exactly 0, and every consumer weights by value."""
    st = side.panels_per_stripe
    nchunks = side.n_windows * side.group
    c = jnp.arange(nchunks)
    w = c // side.group
    word = a["chunk_rp"].reshape(-1)[c // 4]
    rp = (word >> (8 * (c % 4))) & 0xFF
    row_c = ((a["win_stripe"][w] * st + rp) * TILE)[:, None] + (a["coords"] & 127)
    col_c = (a["win_panel"][w] * TILE)[:, None] + (a["coords"] >> 7)
    rows = [row_c.reshape(-1)]
    cols = [col_c.reshape(-1)]
    if side.n_dblocks:
        b = jnp.arange(side.n_dblocks)
        wd = b // DENSE_GROUP
        wordd = a["dblk_rp"].reshape(-1)[b // 4]
        rpd = (wordd >> (8 * (b % 4))) & 0xFF
        i = jnp.arange(TILE)
        row_d = ((a["dblk_stripe"][wd] * st + rpd) * TILE)[:, None, None] \
            + i[None, None, :]
        col_d = (a["dblk_panel"][wd] * TILE)[:, None, None] + i[None, :, None]
        shape = (side.n_dblocks, TILE, TILE)
        rows.append(jnp.broadcast_to(row_d, shape).reshape(-1))
        cols.append(jnp.broadcast_to(col_d, shape).reshape(-1))
    if side.n_qchunks:
        qc = jnp.arange(side.n_qchunks)
        wq = qc // QUAD_GROUP
        nwords = (TILE // side.quad_seg) // 4
        seg = jnp.arange(TILE) // side.quad_seg  # sub-segment of each lane
        words = a["q_rp"].reshape(side.n_qchunks, nwords)
        w = words[qc[:, None], seg[None, :] // 4]  # (nq, TILE)
        rp_q = (w >> (8 * (seg[None, :] % 4))) & 0xFF
        row_q = ((a["qwin_stripe"][wq][:, None] * st + rp_q) * TILE) \
            + a["qlrows"]
        col_q = (a["qwin_panel"][wq] * TILE)[:, None] + a["qlcols"]
        rows.append(row_q.reshape(-1))
        cols.append(col_q.reshape(-1))
    if side.n_coo:
        rows.append(a["coo_rows"])
        cols.append(a["coo_cols"])
    return jnp.concatenate(rows), jnp.concatenate(cols)


def _flat_vals_compact(side: _ShardedSideC, a: dict):
    v = [a["vals"].reshape(-1)]
    if side.n_dblocks:
        v.append(a["dvals"].reshape(-1))
    if side.n_qchunks:
        v.append(a["qvals"].reshape(-1))
    if side.n_coo:
        v.append(a["coo_vals"])
    return jnp.concatenate(v)


def _local_matmul_jnp_compact(side: _ShardedSideC, a: dict, Dt_local):
    """jnp (gather + scatter-add) equivalent of the compact kernels on the
    local arrays — the CPU path: the TPU-interpret Pallas kernel serializes
    per-device execution, which deadlocks the CPU backend's collective
    rendezvous inside shard_map + while_loop."""
    rows_pad = side.n_stripes * side.panels_per_stripe * TILE
    r, c = _slot_coords_compact(side, a)
    v = _flat_vals_compact(side, a)
    contrib = Dt_local[:, c] * v[None, :]
    out = jnp.zeros((Dt_local.shape[0], rows_pad), contrib.dtype)
    return out.at[:, r].add(contrib)


@partial(jax.jit, static_argnames=("mesh", "precision", "transposed"))
def _sharded_matmul(X: ShardedTiled, D, mesh, precision="exact", transposed=False):
    from jax import shard_map

    side = X.bwd if transposed else X.fwd
    axis_out, axis_red = (COLS, ROWS) if transposed else (ROWS, COLS)
    R, C = X.mesh_shape
    k = D.shape[1]
    K = -(-k // 8) * 8
    # D row-sharded over the reduction axis; pad rows to the padded local size
    local_in = side.local_cols
    n_groups = C if not transposed else R
    Dp = jnp.pad(D, ((0, local_in * n_groups - D.shape[0]), (0, K - k)))
    lead = (COLS, ROWS) if transposed else (ROWS, COLS)
    names = _compact_operand_names(side)
    ops = [getattr(side, nm) for nm in names]
    # degree renumbering: the kernel speaks the renumbered local space — the
    # D operand is gathered through the input-space perm on the way in, the
    # output through the output-space rank on the way out (both local)
    in_perm = X.row_perm if transposed else X.col_perm
    out_rank = X.col_rank if transposed else X.row_rank
    renum = in_perm is not None

    def local_fn(*args):
        a = {nm: arr[0, 0] for nm, arr in zip(names, args[: len(names)])}
        Dloc = args[len(names)]  # (local_in, K)
        if renum:
            Dloc = jnp.take(Dloc, args[len(names) + 1][0], axis=0)
        out_local = _local_matmul_compact(side, a, Dloc.T, precision)
        out_local = jax.lax.psum(out_local, axis_red)
        if renum:
            out_local = jnp.take(out_local, args[len(names) + 2][0], axis=1)
        return out_local[None]  # (1, K, local_rows_pad | local_rows)

    in_specs = tuple(
        P(*lead, *([None] * (o.ndim - 2))) for o in ops
    ) + (P(axis_red, None),)
    operands = ops + [Dp]
    if renum:
        in_specs = in_specs + (P(axis_red, None), P(axis_out, None))
        operands += [in_perm, out_rank]
    out_spec = P(axis_out, None, None)

    out = shard_map(
        local_fn,
        mesh=mesh,
        in_specs=in_specs,
        out_specs=out_spec,
        check_vma=False,
    )(*operands)
    # out: (R or C, K, stripes_rows_pad); each device block covers exactly
    # local_rows global rows — drop the per-device stripe padding before
    # concatenating blocks.
    out = out[:, :, : side.local_rows]
    out = jnp.transpose(out, (0, 2, 1)).reshape(-1, K)
    # physical output length of this orientation (independent of any logical
    # transpose flag on X)
    phys_rows = X.shape[1] if (transposed != X.transposed) else X.shape[0]
    return out[:phys_rows, :k]


def sharded_mm(X: ShardedTiled, D, mesh=None, *, precision: str = "exact"):
    """``X @ D`` -> (p, k), output sharded P("rows", None) (or the
    transposed product when X is logically transposed)."""
    mesh = mesh or X.mesh
    return _sharded_matmul(X, D, mesh, precision, X.transposed)


def sharded_mtm(X: ShardedTiled, D, mesh=None, *, precision: str = "exact"):
    """``X' @ D`` -> (n, k), output sharded P("cols", None)."""
    mesh = mesh or X.mesh
    return _sharded_matmul(X, D, mesh, precision, not X.transposed)


# ---------------------------------------------------------------------------
# Per-nonzero ops (SDDMM / value updates / index vectors)
#
# The "nnz vector" of a ShardedTiled is its fwd chunk-slot layout: an
# (R, C, ntiles, TILE) array sharded P("rows", "cols", None, None), padding
# slots holding 0.  sddmm / nnz_values / col_ids / scale_values all speak this
# layout, so solver code (multdiv's Q update, the KL objective, SPA's column
# normalization) composes them exactly like the flat (nnz,) single-chip
# vectors — elementwise math on the layout is elementwise math on the nnz.
# Every op below is local per device under shard_map: the factors arrive in
# their canonical shardings (W row-sharded, H col-sharded), so no collective
# is needed at all.  Reference behavior unlocked by these:
# /root/reference/src/multupd.jl:121-193 (divergence updater) and
# /root/reference/src/spa.jl:41-68 (SPA) on sharded sparse X.
# ---------------------------------------------------------------------------


def _local_sddmm_kernels(side: _ShardedSideC, a: dict, Wl, Htl):
    """Per-device SDDMM through the single-chip Pallas kernels (chunk
    windows + dense-sample einsum + quad-tail), returning the flat value
    layout (chunk slots, dense elements, quad slots)."""
    from types import SimpleNamespace

    from .pallas.sparse import (
        _dense_sample,
        _tiled_sddmm_compact_impl,
        _tiled_sddmm_quad_impl,
    )

    k = Wl.shape[1]
    K = -(-k // 8) * 8
    stripe_width = side.panels_per_stripe * TILE
    p_pad = side.n_stripes * stripe_width
    n_pad = side.n_colpanels * TILE
    Wt = jnp.pad(
        jnp.asarray(Wl, jnp.float32).T, ((0, K - k), (0, p_pad - Wl.shape[0]))
    )
    Ht = jnp.pad(
        jnp.asarray(Htl, jnp.float32).T,
        ((0, K - k), (0, n_pad - Htl.shape[0])),
    )
    out = _tiled_sddmm_compact_impl(
        a["chunk_rp"], a["win_panel"], a["win_stripe"], a["coords"],
        Wt, Ht, (side.n_windows, side.group, stripe_width, 1,
                 side.n_stripes, side.n_colpanels), False,
    )
    flat = out.reshape(-1)
    if side.n_dblocks:
        shim = SimpleNamespace(
            dblk_rp=a["dblk_rp"], dblk_stripe=a["dblk_stripe"],
            dblk_panel=a["dblk_panel"],
            panels_per_stripe=side.panels_per_stripe,
        )
        flat = jnp.concatenate([flat, _dense_sample(shim, Wt, Ht)])
    if side.n_qchunks:
        qout = _tiled_sddmm_quad_impl(
            a["q_rp"], a["qwin_panel"], a["qwin_stripe"], a["qlrows"],
            a["qlcols"], Wt, Ht,
            (side.n_qchunks // QUAD_GROUP, QUAD_GROUP, stripe_width,
             side.quad_seg, side.n_stripes, side.n_colpanels),
            False,
        )
        flat = jnp.concatenate([flat, qout.reshape(-1)])
    if side.n_coo:
        csamp = jnp.sum(
            jnp.take(jnp.asarray(Wl, jnp.float32), a["coo_rows"], axis=0)
            * jnp.take(jnp.asarray(Htl, jnp.float32), a["coo_cols"], axis=0),
            axis=1,
        )
        flat = jnp.concatenate([flat, csamp])
    return flat


@partial(jax.jit, static_argnames=("mesh",))
def _sharded_sddmm_impl(X: ShardedTiled, W, H, mesh):
    from jax import shard_map

    side = X.fwd
    R, C = X.mesh_shape
    local_p, local_n = side.local_rows, side.local_cols
    Wp = jnp.pad(W, ((0, local_p * R - W.shape[0]), (0, 0)))
    Htp = jnp.pad(H.T, ((0, local_n * C - H.shape[1]), (0, 0)))

    names = _compact_operand_names(side)
    meta_ops = [getattr(side, nm) for nm in names]
    S = side.n_slots
    nchunk_slots = side.n_windows * side.group * TILE
    nd = side.n_dblocks * TILE * TILE
    renum = X.row_perm is not None
    extra = [X.row_perm, X.col_perm] if renum else []

    def local_fn(Wl, Htl, *args):
        a = {nm: arr[0, 0] for nm, arr in zip(names, args[: len(names)])}
        if renum:
            # put the factors in the blocks' renumbered order once, so
            # the slot coords index them directly
            Wl = jnp.take(Wl, args[len(names)][0], axis=0)
            Htl = jnp.take(Htl, args[len(names) + 1][0], axis=0)
        if jax.default_backend() != "cpu":
            # on the chip, run the same Pallas SDDMM kernels the
            # single-chip path uses (the jnp gather form below is the
            # CPU fallback — see _local_matmul_jnp_compact for why)
            return _local_sddmm_kernels(side, a, Wl, Htl).reshape(1, 1, S)
        grow, gcol = _slot_coords_compact(side, a)
        # clip: phantom row panels in the last stripe gather garbage
        # rows, but those are all-padding slots (value 0) masked by
        # every consumer.  Dense-block elements go through a per-block
        # einsum instead of the k-wide flat gather: a block stores
        # TILE*TILE samples for >=dense_thresh nonzeros, so the flat
        # gather would blow memory at scale.
        if nd:
            rcq = jnp.concatenate([grow[:nchunk_slots], grow[nchunk_slots + nd:]])
            ccq = jnp.concatenate([gcol[:nchunk_slots], gcol[nchunk_slots + nd:]])
        else:
            rcq, ccq = grow, gcol
        wr = jnp.take(Wl, rcq, axis=0, mode="clip")
        hc = jnp.take(Htl, ccq, axis=0, mode="clip")
        wh_cq = jnp.sum(wr * hc, axis=1)
        if nd:
            # block row/col bases from the stored window metadata
            b = jnp.arange(side.n_dblocks)
            wd = b // DENSE_GROUP
            wordd = a["dblk_rp"].reshape(-1)[b // 4]
            rpd = (wordd >> (8 * (b % 4))) & 0xFF
            rbase = (a["dblk_stripe"][wd] * side.panels_per_stripe + rpd) * TILE
            cbase = a["dblk_panel"][wd] * TILE
            i = jnp.arange(TILE)
            Wb = jnp.take(Wl, rbase[:, None] + i[None, :], axis=0,
                          mode="clip")  # (ndblk, TILE, k)
            Hb = jnp.take(Htl, cbase[:, None] + i[None, :], axis=0,
                          mode="clip")
            wh_d = jnp.einsum("bik,bjk->bji", Wb, Hb).reshape(-1)
            wh = jnp.concatenate(
                [wh_cq[:nchunk_slots], wh_d, wh_cq[nchunk_slots:]]
            )
        else:
            wh = wh_cq
        return wh.reshape(1, 1, S)

    return shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(P(ROWS, None), P(COLS, None)) + tuple(
            P(ROWS, COLS, *([None] * (o.ndim - 2))) for o in meta_ops
        ) + ((P(ROWS, None), P(COLS, None)) if renum else ()),
        out_specs=P(ROWS, COLS, None),
        check_vma=False,
    )(Wp, Htp, *meta_ops, *extra)


def sharded_sddmm(X: ShardedTiled, W, H, mesh=None):
    """``(W @ H)`` sampled at X's nonzeros, in the fwd chunk-slot layout
    (aligned with ``sharded_nnz_values``).  Purely local per device."""
    mesh = mesh or X.mesh
    if X.transposed:
        # pattern of X' at (c, r) samples (W@H)[c, r] = (H' W')[r, c]
        W, H = H.T, W.T
    return _sharded_sddmm_impl(X, W, H, mesh)


@partial(jax.jit, static_argnames=("mesh",))
def _propagate_bwd(X: ShardedTiled, new_fwd_vals, mesh):
    from jax import shard_map

    Sb = X.bwd.n_slots

    def local_fn(fv, b2f):
        flat = fv.reshape(-1)
        out = jnp.take(flat, b2f[0, 0], axis=0, mode="fill", fill_value=0)
        return out.reshape(1, 1, Sb)

    fv_spec = P(ROWS, COLS, *([None] * (new_fwd_vals.ndim - 2)))
    out_spec = P(COLS, ROWS, None)
    return shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(fv_spec, P(COLS, ROWS, None)),
        out_specs=out_spec,
        check_vma=False,
    )(new_fwd_vals, X.b2f)


def _split_side_vals_compact(side: _ShardedSideC, flat):
    """Split a (lead0, lead1, n_slots) flat value layout back into the
    side's chunk/dense/quad value arrays."""
    l0, l1 = flat.shape[:2]
    nchunk = side.n_windows * side.group
    off = nchunk * TILE
    kw = {"vals": flat[..., :off].reshape(l0, l1, nchunk, TILE)}
    if side.n_dblocks:
        nd = side.n_dblocks * TILE * TILE
        kw["dvals"] = flat[..., off : off + nd].reshape(
            l0, l1, side.n_dblocks, TILE, TILE
        )
        off += nd
    if side.n_qchunks:
        nq = side.n_qchunks * TILE
        kw["qvals"] = flat[..., off : off + nq].reshape(
            l0, l1, side.n_qchunks, TILE
        )
        off += nq
    if side.n_coo:
        kw["coo_vals"] = flat[..., off:]
    return dataclasses.replace(side, **kw)


def sharded_scale_values(X: ShardedTiled, new_values, mesh=None) -> ShardedTiled:
    """Same pattern, new values (fwd value layout).  The bwd orientation
    is refreshed by one local gather per device through ``b2f``.  ``stats``
    are recomputed from the new values so ``matops.sq_norm``/``mean``/
    ``all_nonneg`` stay correct on the rescaled matrix (padding slots hold
    exactly 0, so sum/sumsq are unaffected and ``min >= 0`` keeps the same
    truth value as over the real nonzeros)."""
    mesh = mesh or X.mesh
    if X.b2f is None:
        raise ValueError("ShardedTiled built without b2f; rebuild with shard_tiled().")
    new_values = new_values.astype(X.fwd.vals.dtype)
    bwd_vals = _propagate_bwd(X, new_values, mesh)
    v32 = new_values.astype(jnp.float32)
    stats = jnp.stack([jnp.sum(v32), jnp.sum(v32 * v32), jnp.min(v32)])
    fwd = _split_side_vals_compact(X.fwd, new_values)
    bwd = _split_side_vals_compact(X.bwd, bwd_vals)
    return dataclasses.replace(X, fwd=fwd, bwd=bwd, stats=stats)


def sharded_nnz_values(X: ShardedTiled):
    """Values in the flat (R, C, n_slots) fwd layout (chunk slots, dense
    elements, quad slots); padding slots are exactly 0."""
    side = X.fwd
    parts = [side.vals.reshape(*side.vals.shape[:2], -1)]
    if side.n_dblocks:
        parts.append(side.dvals.reshape(*side.dvals.shape[:2], -1))
    if side.n_qchunks:
        parts.append(side.qvals.reshape(*side.qvals.shape[:2], -1))
    if side.n_coo:
        parts.append(side.coo_vals)
    return parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=2)


@partial(jax.jit, static_argnames=("mesh", "which"))
def _sharded_ids_impl(X: ShardedTiled, mesh, which: str):
    from jax import shard_map

    side = X.fwd
    names = _compact_operand_names(side)
    meta_ops = [getattr(side, nm) for nm in names]
    S = side.n_slots
    perm = (X.col_perm if which == "col" else X.row_perm)
    extra = [perm] if perm is not None else []
    perm_spec = P(COLS, None) if which == "col" else P(ROWS, None)

    def local_fn(*args):
        a = {nm: arr[0, 0] for nm, arr in zip(names, args[: len(names)])}
        grow, gcol = _slot_coords_compact(side, a)
        lid = gcol if which == "col" else grow
        if perm is not None:
            # renumbered local id -> original local id (padding slots
            # may sit on phantom panels: clip, their value is 0)
            lid = jnp.take(args[len(names)][0], lid, mode="clip")
        if which == "col":
            g = lid + jax.lax.axis_index(COLS) * side.local_cols
        else:
            g = lid + jax.lax.axis_index(ROWS) * side.local_rows
        return g.astype(jnp.int32).reshape(1, 1, S)

    return shard_map(
        local_fn,
        mesh=mesh,
        in_specs=tuple(
            P(ROWS, COLS, *([None] * (o.ndim - 2))) for o in meta_ops
        ) + ((perm_spec,) if perm is not None else ()),
        out_specs=P(ROWS, COLS, None),
        check_vma=False,
    )(*meta_ops, *extra)

def sharded_col_ids(X: ShardedTiled, mesh=None):
    """Global column index per fwd chunk slot (row index when X is logically
    transposed).  Padding slots carry an arbitrary in-range index — every
    consumer weights by the (zero) padding values."""
    mesh = mesh or X.mesh
    return _sharded_ids_impl(X, mesh, "row" if X.transposed else "col")


def sharded_load_stats(X: ShardedTiled) -> dict:
    """Per-device load report for a sharded sparse matrix.

    On a pod the sweep rate is set by the slowest device, i.e. by data skew
    across the (row-block, col-block) grid.  Returns per-block nonzero
    counts per store, the padded slot counts the kernels actually execute,
    and the max/mean imbalance ratio.  One jitted program whose (R, C) count
    outputs are constrained replicated, so every process can read them —
    multi-process safe, no host gather of the matrix, and a single tunnel
    round-trip.

    When the instance carries ``block_nnz`` (every ``shard_tiled`` build
    since round 5), the report includes ``pattern_nnz`` — the EXACT per-block
    stored-pattern counts agreed at build time, immune to explicitly stored
    zeros.  The per-store ``*_nnz`` rows are still measured as
    ``value != 0`` on the slots (padding is indistinguishable from a stored
    zero at slot level), so on patterns with explicit zeros they undercount;
    prefer ``pattern_nnz`` for exact accounting."""
    side = X.fwd
    rep = NamedSharding(X.mesh, P()) if X.mesh is not None else None
    compact = isinstance(side, _ShardedSideC)
    operands = {"chunk_nnz": (side.vals, (2, 3))}
    slots = side.coords.shape[2] * TILE
    if compact:
        if side.n_dblocks:
            operands["dense_nnz"] = (side.dvals, (2, 3, 4))
            slots += side.n_dblocks * TILE * TILE
        if side.n_qchunks:
            operands["quad_nnz"] = (side.qvals, (2, 3))
            slots += side.n_qchunks * TILE
        if side.n_coo:
            operands["coo_nnz"] = (side.coo_vals, (2,))
            slots += side.n_coo

    def counts(arrs):
        return {
            nm: jnp.sum(a != 0, axis=operands[nm][1]) for nm, a in arrs.items()
        }

    fn = jax.jit(counts, out_shardings=rep) if rep is not None else counts
    out = {
        nm: np.asarray(v)
        for nm, v in fn({nm: a for nm, (a, _) in operands.items()}).items()
    }
    out["padded_slots_per_device"] = slots
    total = sum(v for k, v in out.items() if k.endswith("_nnz"))
    out["total_nnz"] = total
    if X.block_nnz is not None:
        out["pattern_nnz"] = np.asarray(X.block_nnz, np.int64)
    mean = float(total.mean())
    out["imbalance_max_over_mean"] = (
        float(total.max()) / mean if mean else 1.0
    )
    return out


def sharded_colsums(X: ShardedTiled):
    ones = jnp.ones((X.shape[0], 1), X.dtype)
    return sharded_mtm(X, ones)[:, 0]


def sharded_rowsums(X: ShardedTiled):
    ones = jnp.ones((X.shape[1], 1), X.dtype)
    return sharded_mm(X, ones)[:, 0]
