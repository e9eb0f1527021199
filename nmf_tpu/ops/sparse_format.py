"""Tiled-CSR format for the TPU sparse matmul kernel.

Layout (see docs/sparse_kernel_design.md): the matrix is cut into
(128-row x 128-col) tiles, grouped into row *stripes*; each tile's nonzeros
are padded into 128-slot chunks holding (local_row, local_col, value).  The
kernel (``nmf_tpu.ops.pallas.sparse``) walks stripes x column-panels keeping
the D panel and the out stripe resident in VMEM; each chunk costs one
lane-gather + one 128x128 one-hot MXU scatter.

Tiles follow grid order (stripe, col_panel, row_panel_within_stripe) so the
chunk arrays are consumed with plain BlockSpecs.  Tiles with more than 128
nonzeros spill into duplicate chunks, which the accumulating kernel handles
naturally.

Both orientations are prebuilt (for ``X @ D`` and ``X' @ D``), plus
CSR-order COO arrays (for SDDMM/reductions) and permutations mapping
CSR-order values into each orientation's chunk slots — so elementwise value
updates (the divergence sweep's ``Q = X / (WH + delta)``) are two scatters,
no host round-trip.

Preprocessing is numpy here; the C++ binner in ``native/`` covers the
large-scale ingestion path.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..models.common import data_field, static_field

TILE = 128  # row-panel height == col-panel width == chunk capacity

__all__ = ["TILE", "TiledSide", "TiledCSR", "build_tiled", "from_bcoo"]


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class TiledSide:
    """One orientation (rows x cols) of the tiling."""

    lrows: jax.Array = data_field()  # (ntiles, TILE) int32, row within panel
    lcols: jax.Array = data_field()  # (ntiles, TILE) int32, col within panel
    vals: jax.Array = data_field()  # (ntiles, TILE) float
    perm: jax.Array = data_field()  # (nnz,) int64: CSR-order slot in vals
    n_stripes: int = static_field(default=1)
    n_colpanels: int = static_field(default=1)
    tiles_per_step: int = static_field(default=1)
    panels_per_stripe: int = static_field(default=1)
    max_chunks: int = static_field(default=1)
    rows: int = static_field(default=0)
    cols: int = static_field(default=0)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class TiledCSR:
    """Both orientations + CSR-order COO arrays."""

    fwd: TiledSide = data_field()  # X tiling (p x n)
    bwd: TiledSide = data_field()  # X' tiling (n x p)
    row_idx: jax.Array = data_field()  # (nnz,) int32, CSR order
    col_idx: jax.Array = data_field()  # (nnz,) int32
    values: jax.Array = data_field()  # (nnz,)
    shape: tuple[int, int] = static_field(default=(0, 0))

    @property
    def dtype(self):
        return self.values.dtype

    @property
    def nnz(self):
        return self.values.shape[0]

    @property
    def ndim(self):
        return 2

    def with_values(self, new_values):
        """Same pattern, new values (CSR order) — updates both orientations
        via the precomputed slot permutations."""
        fwd_vals = (
            jnp.zeros(self.fwd.vals.size, new_values.dtype)
            .at[self.fwd.perm]
            .set(new_values)
            .reshape(self.fwd.vals.shape)
        )
        bwd_vals = (
            jnp.zeros(self.bwd.vals.size, new_values.dtype)
            .at[self.bwd.perm]
            .set(new_values)
            .reshape(self.bwd.vals.shape)
        )
        return TiledCSR(
            dataclasses.replace(self.fwd, vals=fwd_vals),
            dataclasses.replace(self.bwd, vals=bwd_vals),
            self.row_idx,
            self.col_idx,
            new_values,
            self.shape,
        )

    def transpose(self):
        return TiledCSR(
            self.bwd, self.fwd, self.col_idx, self.row_idx, self.values,
            (self.shape[1], self.shape[0]),
        )


def _build_side(rows, cols, vals, p, n, stripe_tiles):
    """Bin (row, col, val) into the tile/chunk layout for one orientation.
    Returns a TiledSide whose ``perm[i]`` is the flat slot of input nnz i."""
    n_rowpanels = -(-p // TILE)
    n_colpanels = -(-n // TILE)
    stripe_tiles = min(stripe_tiles, n_rowpanels)
    n_stripes = -(-n_rowpanels // stripe_tiles)

    rp = rows // TILE
    cp = cols // TILE
    stripe = rp // stripe_tiles
    rp_in_stripe = rp % stripe_tiles

    order = np.lexsort((rp_in_stripe, cp, stripe))
    s_rows, s_cols, s_vals = rows[order], cols[order], vals[order]
    s_stripe, s_cp, s_rps = stripe[order], cp[order], rp_in_stripe[order]

    key = (s_stripe.astype(np.int64) * n_colpanels + s_cp) * stripe_tiles + s_rps
    uniq, counts = np.unique(key, return_counts=True)
    max_chunks = int(np.max(np.ceil(counts / TILE))) if len(counts) else 1

    tiles_per_step = stripe_tiles * max_chunks
    ntiles = n_stripes * n_colpanels * tiles_per_step
    lrows = np.zeros((ntiles, TILE), np.int32)
    lcols = np.zeros((ntiles, TILE), np.int32)
    out_vals = np.zeros((ntiles, TILE), np.float32)

    starts = np.searchsorted(key, uniq)
    pos_in_group = np.arange(len(key)) - np.repeat(starts, counts)
    chunk_of = pos_in_group // TILE
    slot_of = pos_in_group % TILE

    tile_index = (
        (s_stripe.astype(np.int64) * n_colpanels + s_cp) * tiles_per_step
        + s_rps * max_chunks
        + chunk_of
    )
    lrows[tile_index, slot_of] = (s_rows % TILE).astype(np.int32)
    lcols[tile_index, slot_of] = (s_cols % TILE).astype(np.int32)
    out_vals[tile_index, slot_of] = s_vals

    flat_slot = tile_index * TILE + slot_of
    perm = np.empty(len(key), np.int64)
    perm[order] = flat_slot  # input-order nnz -> slot

    return TiledSide(
        jnp.asarray(lrows),
        jnp.asarray(lcols),
        jnp.asarray(out_vals),
        jnp.asarray(perm),
        n_stripes,
        n_colpanels,
        tiles_per_step,
        stripe_tiles,
        max_chunks,
        p,
        n,
    )


def build_tiled(rows, cols, vals, shape, *, stripe_tiles: int = 32) -> TiledCSR:
    """Build both tiling orientations from COO data (deduped).

    ``stripe_tiles`` row panels per stripe: the kernel's out scratch is
    ``stripe_tiles * 128`` rows x k values (32 panels x k=128 x f32 = 2 MB
    VMEM).
    """
    p, n = shape
    rows = np.asarray(rows, np.int32)
    cols = np.asarray(cols, np.int32)
    vals = np.asarray(vals, np.float32)
    order = np.lexsort((cols, rows))
    rows, cols, vals = rows[order], cols[order], vals[order]
    fwd = _build_side(rows, cols, vals, p, n, stripe_tiles)
    bwd = _build_side(cols, rows, vals, n, p, stripe_tiles)
    return TiledCSR(
        fwd,
        bwd,
        jnp.asarray(rows),
        jnp.asarray(cols),
        jnp.asarray(vals),
        (p, n),
    )


def from_bcoo(X, *, stripe_tiles: int = 32) -> TiledCSR:
    idx = np.asarray(X.indices)
    return build_tiled(
        idx[:, 0], idx[:, 1], np.asarray(X.data), X.shape, stripe_tiles=stripe_tiles
    )
