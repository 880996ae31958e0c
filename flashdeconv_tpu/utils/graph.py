"""Spatial neighbor-graph construction and TPU-friendly neighbor layouts.

Graph *construction* is host-side (scipy cKDTree): it is a one-shot
O(N log N) step. The graph is then converted to the layout the device solver
actually consumes — a **fixed-degree padded neighbor table** ``(N, max_deg)``
plus per-spot neighbor counts — because CSR indptr/indices do not map onto
XLA's static-shape model, while padded gathers do.

Behavioral parity targets (reference ``flashdeconv/utils/graph.py``):
* ``build_knn_graph``   — symmetrized binary kNN          (ref :25-83)
* ``build_radius_graph``— all pairs within radius          (ref :86-133)
* ``build_grid_graph``  — radius at 1.5x detected spacing  (ref :136-172)
* ``coords_to_adjacency`` dispatcher                       (ref :175-212)
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np
from scipy import sparse
from scipy.spatial import cKDTree


def _validate_coords(coords: np.ndarray) -> None:
    if coords.ndim != 2 or coords.shape[1] == 0:
        raise ValueError(
            f"coords must be 2D with at least 1 coordinate dimension, "
            f"got shape {coords.shape}"
        )


def build_knn_graph(
    coords: np.ndarray,
    k: int = 6,
    include_self: bool = False,
) -> sparse.csr_matrix:
    """Symmetrized binary k-nearest-neighbor adjacency.

    ``k`` is clamped to ``n_spots - 1``; the union A | A.T symmetrization means
    actual degrees can exceed ``k``.
    """
    _validate_coords(coords)
    n = coords.shape[0]
    k_eff = min(k, n - 1)
    if k_eff <= 0:
        if include_self and n > 0:
            return sparse.eye(n, dtype=np.float64, format="csr")
        return sparse.csr_matrix((n, n), dtype=np.float64)

    tree = cKDTree(coords)
    _, nbrs = tree.query(coords, k=k_eff + 1, workers=-1)  # includes self

    rows = np.repeat(np.arange(n), k_eff + 1)
    cols = nbrs.ravel()
    if not include_self:
        keep = rows != cols
        rows, cols = rows[keep], cols[keep]

    A = sparse.csr_matrix(
        (np.ones(rows.size, dtype=np.float64), (rows, cols)), shape=(n, n)
    )
    A = A + A.T
    A.data[:] = 1.0
    return A


def build_radius_graph(
    coords: np.ndarray,
    radius: float,
    include_self: bool = False,
) -> sparse.csr_matrix:
    """Binary adjacency connecting every pair of spots within ``radius``."""
    _validate_coords(coords)
    n = coords.shape[0]
    tree = cKDTree(coords)
    pairs = tree.query_pairs(r=radius, output_type="ndarray")

    if pairs.shape[0] == 0:
        if include_self and n > 0:
            return sparse.eye(n, dtype=np.float64, format="csr")
        return sparse.csr_matrix((n, n), dtype=np.float64)

    rows = np.concatenate([pairs[:, 0], pairs[:, 1]])
    cols = np.concatenate([pairs[:, 1], pairs[:, 0]])
    A = sparse.csr_matrix(
        (np.ones(rows.size, dtype=np.float64), (rows, cols)), shape=(n, n)
    )
    if include_self:
        A = A + sparse.eye(n, dtype=np.float64)
    return A.tocsr()


def build_grid_graph(
    coords: np.ndarray,
    grid_spacing: Optional[float] = None,
) -> sparse.csr_matrix:
    """Adjacency for regular-grid platforms (Visium / Visium HD / Stereo-seq).

    Auto-detects spacing as the median nearest-neighbor distance and connects
    spots within 1.5x spacing (covers hexagonal and square lattices).
    """
    _validate_coords(coords)
    n = coords.shape[0]
    if n <= 1:
        return sparse.csr_matrix((n, n), dtype=np.float64)
    if grid_spacing is None:
        tree = cKDTree(coords)
        d, _ = tree.query(coords, k=2, workers=-1)
        grid_spacing = float(np.median(d[:, 1]))
    return build_radius_graph(coords, radius=grid_spacing * 1.5)


def coords_to_adjacency(
    coords: np.ndarray,
    method: str = "knn",
    k: int = 6,
    radius: Optional[float] = None,
) -> sparse.csr_matrix:
    """Dispatch graph construction by method name ("knn" | "radius" | "grid")."""
    if method == "knn":
        return build_knn_graph(coords, k=k)
    if method == "radius":
        if radius is None:
            raise ValueError("radius must be specified for radius method")
        return build_radius_graph(coords, radius=radius)
    if method == "grid":
        return build_grid_graph(coords)
    raise ValueError(f"Unknown method: {method}")


def grid_coords(
    n_spots: Optional[int] = None, side: Optional[int] = None
) -> np.ndarray:
    """Row-major (x, y) float64 coordinates of a square grid.

    The synthetic-layout every benchmark/example/test shares (ONE home so
    the grid convention cannot drift): ``side=`` gives the full
    side x side lattice; ``n_spots=`` gives the first n rows of the
    ceil-sqrt lattice. Bit-identical to the historical inline pattern
    ``np.meshgrid(arange(side), arange(side))`` +
    ``column_stack([xs.ravel(), ys.ravel()]).astype(float)``.
    """
    if side is None:
        if n_spots is None:
            raise ValueError("pass n_spots= or side=")
        side = int(np.ceil(np.sqrt(n_spots)))
    xs, ys = np.meshgrid(np.arange(side), np.arange(side))
    coords = np.column_stack([xs.ravel(), ys.ravel()])
    if n_spots is not None:
        coords = coords[:n_spots]
    return coords.astype(float)


def _csr_row_positions(
    A_csr: sparse.csr_matrix, counts: np.ndarray
) -> Tuple[np.ndarray, np.ndarray]:
    """(row, position-within-row) for every stored CSR entry — the scatter
    coordinates every padded-neighbor-table builder shares (here and in
    ``parallel/partition.plan_shards``). ONE home so a semantic change
    (e.g. tolerating unsorted indices) cannot drift between copies."""
    row_of = np.repeat(np.arange(len(counts)), counts)
    pos_in_row = np.arange(A_csr.nnz) - np.repeat(A_csr.indptr[:-1], counts)
    return row_of, pos_in_row


def adjacency_to_padded(
    A: sparse.spmatrix,
    pad_to_multiple: int = 1,
) -> Tuple[np.ndarray, np.ndarray]:
    """Convert a sparse adjacency to the device layout: padded neighbor table.

    Returns
    -------
    nbr_idx : (n_spots, max_deg) int32
        Neighbor indices per spot. Padding slots hold ``n_spots`` — the index
        of an all-zero sentinel row appended to beta on device, so padded
        gathers contribute exactly zero to neighbor sums.
    n_neighbors : (n_spots,) int32
        True neighbor count per spot.
    """
    A_csr = A.tocsr()
    n = A_csr.shape[0]
    counts = np.diff(A_csr.indptr).astype(np.int32)
    max_deg = int(counts.max()) if n > 0 else 0
    if pad_to_multiple > 1 and max_deg > 0:
        max_deg = -(-max_deg // pad_to_multiple) * pad_to_multiple
    max_deg = max(max_deg, 1)  # keep a non-degenerate trailing axis

    nbr = np.full((n, max_deg), n, dtype=np.int32)
    if A_csr.nnz > 0:
        row_of, pos_in_row = _csr_row_positions(A_csr, counts)
        nbr[row_of, pos_in_row] = A_csr.indices.astype(np.int32)
    return nbr, counts


def adjacency_to_padded_capped(
    A: sparse.spmatrix,
    max_degree: Optional[int] = None,
    quantile: float = 0.999,
    slack: float = 1.5,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Padded neighbor table with a degree cap + overflow edge list.

    Radius/hub graphs can contain a few spots whose degree dwarfs the typical
    one (a dense cluster under ``spatial_method="radius"``); padding the whole
    (N, max_deg) table to that outlier makes solver memory O(N * max_deg).
    Here the table is capped at ``slack * quantile``-degree (or an explicit
    ``max_degree``) and the excess edges of hub spots spill into a flat edge
    list consumed by :func:`flashdeconv_tpu.ops.bcd.overflow_sum` — memory
    becomes O(N * cap + E_overflow), the role CSR plays in the reference
    (reference ``flashdeconv/core/solver.py:363-365``).

    Returns
    -------
    nbr_idx : (n_spots, cap) int32 — first ``cap`` neighbors per spot,
        padding slots == n_spots (the zero-sentinel row). When the cap does
        not bind this is byte-identical to :func:`adjacency_to_padded`.
    n_neighbors : (n_spots,) int32 — TRUE degree (table + overflow).
    ov_src : (E,) int32 — spot index of each overflow edge.
    ov_dst : (E,) int32 — neighbor index of each overflow edge.
    """
    A_csr = A.tocsr()
    n = A_csr.shape[0]
    counts = np.diff(A_csr.indptr).astype(np.int32)
    max_deg = int(counts.max()) if n > 0 and A_csr.nnz > 0 else 0

    if max_degree is None:
        cap = int(np.ceil(slack * np.quantile(counts, quantile))) if n else 0
    else:
        cap = int(max_degree)
    cap = max(cap, 1)

    if max_deg <= cap:
        nbr, n_nbrs = adjacency_to_padded(A_csr)
        empty = np.zeros(0, dtype=np.int32)
        return nbr, n_nbrs, empty, empty

    nbr = np.full((n, cap), n, dtype=np.int32)
    row_of, pos_in_row = _csr_row_positions(A_csr, counts)
    in_table = pos_in_row < cap
    nbr[row_of[in_table], pos_in_row[in_table]] = A_csr.indices[
        in_table
    ].astype(np.int32)
    ov = ~in_table
    ov_src = row_of[ov].astype(np.int32)
    ov_dst = A_csr.indices[ov].astype(np.int32)
    return nbr, counts, ov_src, ov_dst


def cap_sparse_bands(
    offsets: np.ndarray,
    masks: np.ndarray,
    A_rest: sparse.spmatrix,
    total_nnz: int,
    min_density: float = 0.05,
    max_spill_frac: float = 0.02,
) -> Tuple[np.ndarray, np.ndarray, sparse.csr_matrix]:
    """Spill near-empty bands out of a banded decomposition.

    A finite-grid kNN graph grows boundary-artifact bands (corner/edge
    spots whose k-th nearest neighbor sits 2 rows/columns away): on the
    1M benchmark grid, 8 of 16 bands hold <0.2% of the edges each, yet
    each band costs the fused sweep kernel one full-(K, B) FMA pass per
    sweep (~38 us at 1M x 20 — round-5 ablation). Bands with density
    below ``min_density`` are removed from the banded set and their
    edges merged into ``A_rest``, PROVIDED the combined spill stays
    under ``max_spill_frac`` of the graph's edges (the rest machinery is
    compact-scatter-based and must stay O(small)); otherwise the
    decomposition is returned unchanged.

    Returns the same triple shape as :func:`banded_split`.
    """
    if offsets.size == 0 or masks.size == 0:
        return offsets, masks, A_rest.tocsr()
    dens = masks.mean(axis=1)
    spill = dens < min_density
    if not spill.any():
        return offsets, masks, A_rest.tocsr()
    spilled_nnz = int(masks[spill].sum())
    if spilled_nnz > max_spill_frac * max(int(total_nnz), 1):
        return offsets, masks, A_rest.tocsr()
    n = masks.shape[1]
    rows = []
    cols = []
    for u in np.flatnonzero(spill):
        j = np.flatnonzero(masks[u])
        rows.append(j)
        cols.append(j + int(offsets[u]))
    rows = np.concatenate(rows) if rows else np.zeros(0, np.int64)
    cols = np.concatenate(cols) if cols else np.zeros(0, np.int64)
    spill_m = sparse.coo_matrix(
        (np.ones(rows.size, dtype=np.float32), (rows, cols)), shape=(n, n)
    )
    A_rest2 = (A_rest.tocsr() + spill_m.tocsr()).tocsr()
    A_rest2.sort_indices()
    return offsets[~spill], masks[~spill], A_rest2


def banded_split(
    A: sparse.spmatrix,
    max_offsets: int = 16,
    min_coverage: float = 0.0,
) -> Tuple[np.ndarray, np.ndarray, sparse.csr_matrix]:
    """Split an adjacency into diagonal bands + an irregular remainder.

    Grid-structured spatial graphs (Visium HD bins, Stereo-seq bins, or any
    Morton-ordered planar kNN graph) concentrate their edges on a handful of
    row offsets ``j - i`` (e.g. ±1, ±row_length, ±row_length±1). On TPU a
    neighbor sum over such edges is far cheaper as **contiguous shifted adds**
    (one streaming pass per offset) than as a random row gather, which is
    DMA-latency-bound at ~10 GB/s effective.

    Returns
    -------
    offsets : (U,) int64, sorted — the retained diagonal offsets. Offset 0
        appears iff the adjacency has explicit diagonal entries (self-loops
        are kept, matching the gather path's treatment of CSR diagonals).
    masks : (U, N) float32 — ``masks[u, i] = 1`` iff edge (i, i+offsets[u])
        exists (both endpoints in range)
    A_rest : CSR with every edge not covered by the bands (possibly empty)
    """
    A_coo = A.tocoo()
    n = A_coo.shape[0]
    if A_coo.nnz == 0:
        return (
            np.zeros(0, dtype=np.int64),
            np.zeros((0, n), dtype=np.float32),
            A.tocsr(),
        )

    off = A_coo.col.astype(np.int64) - A_coo.row.astype(np.int64)
    vals, counts = np.unique(off, return_counts=True)
    order = np.argsort(-counts)[:max_offsets]
    offsets = np.sort(vals[order])

    in_band = np.isin(off, offsets)
    coverage = in_band.sum() / off.size
    if coverage < min_coverage:
        return (
            np.zeros(0, dtype=np.int64),
            np.zeros((0, n), dtype=np.float32),
            A.tocsr(),
        )

    masks = np.zeros((offsets.size, n), dtype=np.float32)
    u_idx = np.searchsorted(offsets, off[in_band])
    masks[u_idx, A_coo.row[in_band]] = 1.0

    rest = ~in_band
    A_rest = sparse.csr_matrix(
        (A_coo.data[rest], (A_coo.row[rest], A_coo.col[rest])), shape=(n, n)
    )
    return offsets, masks, A_rest


def get_neighbor_counts(A: sparse.spmatrix) -> np.ndarray:
    """Number of neighbors per spot (row sums of a binary adjacency)."""
    return np.asarray(A.sum(axis=1)).ravel().astype(np.int32)


def get_neighbor_indices(A: sparse.spmatrix) -> list:
    """Per-spot neighbor index arrays (host-side convenience accessor)."""
    A_csr = A.tocsr()
    return [
        A_csr.indices[A_csr.indptr[i] : A_csr.indptr[i + 1]].copy()
        for i in range(A_csr.shape[0])
    ]
