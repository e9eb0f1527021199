"""Sharded tiled-CSR: the multi-chip sparse matmul path.

2-D decomposition matching the canonical dense layout (X: P(rows, cols)):
device (i, j) owns the nonzeros whose row falls in row-block i and column in
col-block j, stored as a local TiledSide in *local* coordinates.

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
from .sparse_format import TILE, _build_side, TiledSide

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
]


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class _ShardedSide:
    """Per-device TiledSides for one orientation, as global sharded arrays.

    Arrays have leading (R, C) device axes (fwd; (C, R) for bwd), sharded
    one block per device; each process materializes only its own blocks.
    """

    lrows: jax.Array = data_field()  # (R, C, ntiles, TILE) int32
    lcols: jax.Array = data_field()
    vals: jax.Array = data_field()
    n_stripes: int = static_field(default=1)
    n_colpanels: int = static_field(default=1)
    tiles_per_step: int = static_field(default=1)
    panels_per_stripe: int = static_field(default=1)
    max_chunks: int = static_field(default=1)
    local_rows: int = static_field(default=0)  # padded local row count
    local_cols: int = static_field(default=0)  # padded local col count


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class ShardedTiled:
    """2-D sharded sparse matrix for the mesh-parallel kernel.

    ``stats`` = (sum, sum of squares, min) of the values — enough for
    validation, mean() and the Gram-identity MSE objective without keeping
    the raw COO on every host.  ``transposed`` flips the orientation
    logically (``transpose()`` is free).
    """

    fwd: _ShardedSide = data_field()
    bwd: _ShardedSide = data_field()
    stats: jax.Array = data_field(default=None)
    # (C, R, bwd_slots) int32: for each bwd chunk slot, the fwd chunk slot
    # holding the same nonzero (out-of-range = padding).  Lets per-nnz value
    # updates propagate fwd -> bwd with one local gather per device.
    b2f: jax.Array | None = data_field(default=None)
    shape: tuple[int, int] = static_field(default=(0, 0))
    mesh_shape: tuple[int, int] = static_field(default=(1, 1))
    transposed: bool = static_field(default=False)
    mesh: Mesh | None = static_field(default=None)

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


def _side_meta(local_p, local_n, stripe_tiles, max_chunks):
    """Static grid metadata of one block orientation (mirrors _build_side)."""
    n_rowpanels = -(-local_p // TILE)
    n_colpanels = -(-local_n // TILE)
    st = min(stripe_tiles, n_rowpanels)
    n_stripes = -(-n_rowpanels // st)
    tiles_per_step = st * max_chunks
    ntiles = n_stripes * n_colpanels * tiles_per_step
    return n_stripes, n_colpanels, tiles_per_step, st, ntiles


def _pad_side(s: TiledSide, max_mc: int):
    """Pad a block's chunk arrays to ``max_mc`` chunk slots per tile; returns
    (lrows, lcols, vals, perm) as numpy with the perm remapped to the padded
    slot layout."""
    lr0 = np.asarray(s.lrows)
    lc0 = np.asarray(s.lcols)
    vv0 = np.asarray(s.vals)
    perm0 = np.asarray(s.perm)
    if s.max_chunks == max_mc:
        return lr0, lc0, vv0, perm0
    n_groups = s.n_stripes * s.n_colpanels * s.panels_per_stripe
    lr = np.zeros((n_groups * max_mc, TILE), np.int32)
    lc = np.zeros_like(lr)
    vv = np.zeros(lr.shape, np.float32)
    lr.reshape(n_groups, max_mc, TILE)[:, : s.max_chunks] = lr0.reshape(
        n_groups, s.max_chunks, TILE
    )
    lc.reshape(n_groups, max_mc, TILE)[:, : s.max_chunks] = lc0.reshape(
        n_groups, s.max_chunks, TILE
    )
    vv.reshape(n_groups, max_mc, TILE)[:, : s.max_chunks] = vv0.reshape(
        n_groups, s.max_chunks, TILE
    )
    # remap slot perm: old slot ((g*old_mc + c)*TILE + t) ->
    # ((g*max_mc + c)*TILE + t)
    tile_old, slot = perm0 // TILE, perm0 % TILE
    g, c = tile_old // s.max_chunks, tile_old % s.max_chunks
    perm = (g * max_mc + c) * TILE + slot
    return lr, lc, vv, perm


def _assemble(mesh, spec, global_shape, blocks, key_fn):
    """Global sharded array from per-block host arrays this process owns.
    ``blocks[(i, j)]`` is the (i, j) device block WITHOUT the two leading
    unit dims; ``key_fn(index)`` maps a shard index to the (i, j) key."""

    def cb(index):
        return blocks[key_fn(index)][None, None]

    return jax.make_array_from_callback(
        global_shape, NamedSharding(mesh, spec), cb
    )


def _fwd_key(index):
    return (index[0].start or 0, index[1].start or 0)


def _bwd_key(index):
    return (index[1].start or 0, index[0].start or 0)


def shard_tiled(
    rows, cols, vals, shape, mesh: Mesh, *, stripe_tiles: int = 32,
    local: bool = False,
) -> ShardedTiled:
    """Build the 2-D sharded tiling from COO data for ``mesh``.

    **Process-local**: each process bins and materializes ONLY the (row-block,
    col-block) tiles owned by its own devices — at the 10M x 1M scale no host
    ever holds the whole matrix.  Cross-process coordination is two tiny
    allgathers (the uniform chunk-padding bound and the value stats); the
    global arrays are assembled with ``jax.make_array_from_callback``.

    ``local=False`` (default): every process passes the FULL COO and keeps
    its share (convenient single-host path).  ``local=True``: each process
    passes only its own nonzeros (e.g. from its input-file shard); entries
    that belong to another process's blocks raise.
    """
    p, n = shape
    R = mesh.shape[ROWS]
    C = mesh.shape[COLS]
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

    bi = rows // local_p
    bj = cols // local_n
    covered = np.zeros(len(rows), bool)
    fwd_blocks, bwd_blocks = {}, {}
    for (i, j) in owned:
        m = (bi == i) & (bj == j)
        covered |= m
        fwd_blocks[(i, j)] = _build_side(
            rows[m] - i * local_p, cols[m] - j * local_n, vals[m],
            local_p, local_n, stripe_tiles,
        )
        bwd_blocks[(i, j)] = _build_side(
            cols[m] - j * local_n, rows[m] - i * local_p, vals[m],
            local_n, local_p, stripe_tiles,
        )
    if local and not covered.all():
        raise ValueError(
            "local=True: some nonzeros fall in blocks owned by other "
            "processes; pass each process only its own entries."
        )

    # uniform chunk padding + value stats: the only cross-process agreement
    mc_f = max((s.max_chunks for s in fwd_blocks.values()), default=1)
    mc_b = max((s.max_chunks for s in bwd_blocks.values()), default=1)
    ov = vals[covered] if multiproc else vals
    stats_local = np.asarray(
        [ov.sum(dtype=np.float64), (ov.astype(np.float64) ** 2).sum(),
         ov.min() if len(ov) else np.inf],
        np.float64,
    )
    if multiproc:
        from jax.experimental import multihost_utils

        g = multihost_utils.process_allgather(
            np.asarray([mc_f, mc_b], np.int64)
        )
        mc_f, mc_b = int(g[..., 0].max()), int(g[..., 1].max())
        sg = multihost_utils.process_allgather(stats_local)
        stats_local = np.asarray(
            [sg[..., 0].sum(), sg[..., 1].sum(), sg[..., 2].min()]
        )
    if not np.isfinite(stats_local[2]):
        stats_local[2] = 0.0
    stats = jnp.asarray(stats_local, jnp.float32)

    nsf, ncf, tpsf, stf, ntf = _side_meta(local_p, local_n, stripe_tiles, mc_f)
    nsb, ncb, tpsb, stb, ntb = _side_meta(local_n, local_p, stripe_tiles, mc_b)

    padded_f = {k: _pad_side(s, mc_f) for k, s in fwd_blocks.items()}
    padded_b = {k: _pad_side(s, mc_b) for k, s in bwd_blocks.items()}
    # per-device bwd-slot -> fwd-slot map (same nnz subset, same masked order
    # on both orientations)
    b2f_blocks = {}
    for k in padded_f:
        pf, pb = padded_f[k][3], padded_b[k][3]
        m = np.full(ntb * TILE, ntf * TILE, np.int32)
        m[pb] = pf
        b2f_blocks[k] = m

    def side_arrays(padded, which):
        return {k: v[which] for k, v in padded.items()}

    fwd = _ShardedSide(
        _assemble(mesh, P(ROWS, COLS, None, None), (R, C, ntf, TILE),
                  side_arrays(padded_f, 0), _fwd_key),
        _assemble(mesh, P(ROWS, COLS, None, None), (R, C, ntf, TILE),
                  side_arrays(padded_f, 1), _fwd_key),
        _assemble(mesh, P(ROWS, COLS, None, None), (R, C, ntf, TILE),
                  side_arrays(padded_f, 2), _fwd_key),
        nsf, ncf, tpsf, stf, mc_f, local_p, local_n,
    )
    bwd = _ShardedSide(
        _assemble(mesh, P(COLS, ROWS, None, None), (C, R, ntb, TILE),
                  side_arrays(padded_b, 0), _bwd_key),
        _assemble(mesh, P(COLS, ROWS, None, None), (C, R, ntb, TILE),
                  side_arrays(padded_b, 1), _bwd_key),
        _assemble(mesh, P(COLS, ROWS, None, None), (C, R, ntb, TILE),
                  side_arrays(padded_b, 2), _bwd_key),
        nsb, ncb, tpsb, stb, mc_b, local_n, local_p,
    )
    b2f = _assemble(
        mesh, P(COLS, ROWS, None), (C, R, ntb * TILE), b2f_blocks, _bwd_key,
    )
    return ShardedTiled(fwd, bwd, stats, b2f, (p, n), (R, C), False, mesh)


def _local_matmul(side_meta, lrows, lcols, vals, Dt_local, precision):
    if jax.default_backend() == "cpu":
        # The TPU-interpret Pallas kernel serializes per-device execution,
        # which deadlocks the CPU backend's collective rendezvous when this
        # runs inside shard_map + while_loop.  Use an equivalent jnp
        # formulation on CPU; the real kernel runs on TPU.
        return _local_matmul_jnp(side_meta, lrows, lcols, vals, Dt_local)
    from .pallas.sparse import _tiled_matmul_impl

    meta = (
        side_meta.n_stripes,
        side_meta.n_colpanels,
        side_meta.tiles_per_step,
        side_meta.max_chunks,
        side_meta.panels_per_stripe * TILE,
        side_meta.n_stripes * side_meta.panels_per_stripe * TILE,
    )
    return _tiled_matmul_impl(lrows, lcols, vals, Dt_local, meta, False, precision)


def _local_matmul_jnp(side_meta, lrows, lcols, vals, Dt_local):
    """jnp (gather + scatter-add) equivalent of the Pallas tiled kernel on
    the local chunk arrays; same (K, rows_pad) output."""
    ncp = side_meta.n_colpanels
    tps = side_meta.tiles_per_step
    mc = side_meta.max_chunks
    pps = side_meta.panels_per_stripe
    rows_pad = side_meta.n_stripes * pps * TILE
    ntiles = lrows.shape[0]
    t = jnp.arange(ntiles)
    stripe = t // (ncp * tps)
    rem = t % (ncp * tps)
    cp = rem // tps
    rp = (rem % tps) // mc
    grow = ((stripe * pps + rp) * TILE)[:, None] + lrows  # (ntiles, TILE)
    gcol = (cp * TILE)[:, None] + lcols
    flat_rows = grow.reshape(-1)
    flat_cols = gcol.reshape(-1)
    flat_vals = vals.reshape(-1)
    contrib = Dt_local[:, flat_cols] * flat_vals[None, :]  # (K, nnz_slots)
    out = jnp.zeros((Dt_local.shape[0], rows_pad), contrib.dtype)
    return out.at[:, flat_rows].add(contrib)


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

    def local_fn(lrows, lcols, vals, Dloc):
        # lrows: (1, 1, ntiles, TILE); Dloc: (local_in, K)
        out_local = _local_matmul(
            side, lrows[0, 0], lcols[0, 0], vals[0, 0], Dloc.T, precision
        )  # (K, local_rows_pad)
        out_local = jax.lax.psum(out_local, axis_red)
        return out_local[None]  # (1, K, local_rows_pad)

    in_specs = (
        (P(ROWS, COLS, None, None), P(ROWS, COLS, None, None), P(ROWS, COLS, None, None), P(COLS, None))
        if not transposed
        else (P(COLS, ROWS, None, None), P(COLS, ROWS, None, None), P(COLS, ROWS, None, None), P(ROWS, None))
    )
    out_spec = P(axis_out, None, None)

    out = shard_map(
        local_fn,
        mesh=mesh,
        in_specs=in_specs,
        out_specs=out_spec,
        check_vma=False,
    )(side.lrows, side.lcols, side.vals, Dp)
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


def _panel_offsets(side: _ShardedSide, nt: int):
    """Static per-tile (row, col) padded-local offsets for the grid layout:
    slot (t, s) sits at local row ``row_off[t] + lrows[t, s]`` and local col
    ``col_off[t] + lcols[t, s]``."""
    t = np.arange(nt)
    stripe = t // (side.n_colpanels * side.tiles_per_step)
    rem = t % (side.n_colpanels * side.tiles_per_step)
    cp = rem // side.tiles_per_step
    rp = (rem % side.tiles_per_step) // side.max_chunks
    row_off = ((stripe * side.panels_per_stripe + rp) * TILE).astype(np.int32)
    col_off = (cp * TILE).astype(np.int32)
    return jnp.asarray(row_off[:, None]), jnp.asarray(col_off[:, None])


@partial(jax.jit, static_argnames=("mesh",))
def _sharded_sddmm_impl(X: ShardedTiled, W, H, mesh):
    from jax import shard_map

    side = X.fwd
    R, C = X.mesh_shape
    nt = side.lrows.shape[2]
    local_p, local_n = side.local_rows, side.local_cols
    Wp = jnp.pad(W, ((0, local_p * R - W.shape[0]), (0, 0)))
    Htp = jnp.pad(H.T, ((0, local_n * C - H.shape[1]), (0, 0)))
    row_off, col_off = _panel_offsets(side, nt)

    def local_fn(lrows, lcols, Wl, Htl):
        grow = (row_off + lrows[0, 0]).reshape(-1)
        gcol = (col_off + lcols[0, 0]).reshape(-1)
        # clip: phantom row panels in the last stripe gather garbage rows,
        # but those are all-padding slots (value 0) masked by every consumer
        wr = jnp.take(Wl, grow, axis=0, mode="clip")
        hc = jnp.take(Htl, gcol, axis=0, mode="clip")
        wh = jnp.sum(wr * hc, axis=1)
        return wh.reshape(1, 1, nt, TILE)

    return shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(
            P(ROWS, COLS, None, None),
            P(ROWS, COLS, None, None),
            P(ROWS, None),
            P(COLS, None),
        ),
        out_specs=P(ROWS, COLS, None, None),
        check_vma=False,
    )(side.lrows, side.lcols, Wp, Htp)


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

    ntb = X.bwd.lrows.shape[2]

    def local_fn(fv, b2f):
        flat = fv.reshape(-1)
        out = jnp.take(flat, b2f[0, 0], axis=0, mode="fill", fill_value=0)
        return out.reshape(1, 1, ntb, TILE)

    return shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(P(ROWS, COLS, None, None), P(COLS, ROWS, None)),
        out_specs=P(COLS, ROWS, None, None),
        check_vma=False,
    )(new_fwd_vals, X.b2f)


def sharded_scale_values(X: ShardedTiled, new_values, mesh=None) -> ShardedTiled:
    """Same pattern, new values (fwd chunk-slot layout).  The bwd orientation
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
    return dataclasses.replace(
        X,
        fwd=dataclasses.replace(X.fwd, vals=new_values),
        bwd=dataclasses.replace(X.bwd, vals=bwd_vals),
        stats=stats,
    )


def sharded_nnz_values(X: ShardedTiled):
    """(R, C, ntiles, TILE) values in the fwd chunk-slot layout; padding
    slots are exactly 0."""
    return X.fwd.vals


@partial(jax.jit, static_argnames=("mesh", "which"))
def _sharded_ids_impl(X: ShardedTiled, mesh, which: str):
    from jax import shard_map

    side = X.fwd
    nt = side.lrows.shape[2]
    row_off, col_off = _panel_offsets(side, nt)

    def local_fn(lrows, lcols):
        if which == "col":
            j = jax.lax.axis_index(COLS)
            g = col_off + lcols[0, 0] + j * side.local_cols
        else:
            i = jax.lax.axis_index(ROWS)
            g = row_off + lrows[0, 0] + i * side.local_rows
        return g.astype(jnp.int32)[None, None]

    return shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(P(ROWS, COLS, None, None), P(ROWS, COLS, None, None)),
        out_specs=P(ROWS, COLS, None, None),
        check_vma=False,
    )(side.lrows, side.lcols)


def sharded_col_ids(X: ShardedTiled, mesh=None):
    """Global column index per fwd chunk slot (row index when X is logically
    transposed).  Padding slots carry an arbitrary in-range index — every
    consumer weights by the (zero) padding values."""
    mesh = mesh or X.mesh
    return _sharded_ids_impl(X, mesh, "row" if X.transposed else "col")


def sharded_colsums(X: ShardedTiled):
    ones = jnp.ones((X.shape[0], 1), X.dtype)
    return sharded_mtm(X, ones)[:, 0]


def sharded_rowsums(X: ShardedTiled):
    ones = jnp.ones((X.shape[1], 1), X.dtype)
    return sharded_mm(X, ones)[:, 0]
