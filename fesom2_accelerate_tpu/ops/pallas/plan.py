"""Host-side planning for windowed Pallas gathers.

The TPU has no hardware gather: the Pallas kernels express every irregular
mesh access as a **one-hot contraction on the MXU** against a VMEM-resident
*window* of the source array.  That requires index locality: for each tile of
output entities, all source indices must fall inside a bounded, 128-aligned
window.  The mesh generator's row-major numbering (and, in general, any
bandwidth-reducing ordering such as RCM) provides it; this module verifies it
per mesh and precomputes:

* ``win_start``  [T]     — 128-aligned element offset of each tile's window
* ``local_idx``  [T, C]  — source indices rebased to the tile's window

Tiles with C = tile * K columns laid out k-major (column ``k * tile + t``),
so per-k slices are contiguous lanes and the reduce over K needs no lane
reshape.

This is the TPU-native replacement for the reference's raw CSR gathers
(kernels/fct_ale_a3.cu:9-24) and atomic scatters
(kernels/fct_ale_b1_horizontal.cu:24-27).
"""

from __future__ import annotations

import dataclasses

import numpy as np


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@dataclasses.dataclass
class GatherPlan:
    """Windowed gather of K source values per output entity.

    Pallas BlockSpec index maps address whole W-blocks, but an index span can
    straddle any alignment boundary — so each tile reads TWO adjacent
    W-blocks, ``win_block[i]`` and ``win_block[i] + 1`` (clamped), which is
    guaranteed to cover any span <= W.  ``local_idx`` is rebased to
    ``win_block[i] * W`` and lies in [0, 2W)."""

    tile: int  # output entities per tile
    K: int  # gathered values per entity
    window: int  # window block width W (power of two >= 256)
    n_tiles: int
    win_block: np.ndarray  # [T] int32, first block (units of W)
    win_block2: np.ndarray  # [T] int32, second block, min(wb+1, last)
    local_idx: np.ndarray  # [T, K*tile] int32 (k-major columns), in [0, 2W)
    valid: np.ndarray  # [T, K*tile] bool
    src_size: int  # padded source length (multiple of W) windows index into


def build_gather_plan(idx: np.ndarray, valid: np.ndarray, tile: int,
                      src_size: int, min_window: int = 256) -> GatherPlan:
    """idx: [M, K] source indices per output entity (garbage where ~valid).

    W = smallest power of two >= max tile span (and >= min_window).  Raises
    if W exceeds the source size (no locality in the mesh ordering — reorder
    the mesh or fall back to the XLA path)."""
    M, K = idx.shape
    n_tiles = _round_up(M, tile) // tile
    Mp = n_tiles * tile
    idx_p = np.zeros((Mp, K), dtype=np.int64)
    idx_p[:M] = idx
    valid_p = np.zeros((Mp, K), dtype=bool)
    valid_p[:M] = valid

    tiles_idx = idx_p.reshape(n_tiles, tile, K)
    tiles_valid = valid_p.reshape(n_tiles, tile, K)
    big = np.iinfo(np.int64).max
    mins = np.where(tiles_valid, tiles_idx, big).min(axis=(1, 2))
    maxs = np.where(tiles_valid, tiles_idx, -1).max(axis=(1, 2))
    empty = maxs < 0
    mins = np.where(empty, 0, mins)
    maxs = np.where(empty, 0, maxs)

    span = int((maxs - mins).max()) + 1
    W = min_window
    while W < span:
        W *= 2
    if W > max(src_size, min_window):
        raise ValueError(
            f"gather window {W} exceeds source size {src_size}: "
            "mesh ordering lacks locality"
        )

    win_block = mins // W
    assert (maxs < (win_block + 2) * W).all()
    # the second block is ALWAYS wb+1 (never clamped): clamping to wb would
    # double-count scatter contributions.  The source therefore carries one
    # extra W-block of padding (src_size below); scatter id padding is -1 and
    # gather local_idx stays < 2W, so the extra block is inert.
    src_pad = _round_up(src_size, W) + W
    win_block2 = win_block + 1

    # invalid slots get the sentinel index 2W: one window position PAST the
    # two-block window, so the one-hot selects nothing (or the kernel's
    # appended neutral column block, when it provides one)
    local = tiles_idx - (win_block * W)[:, None, None]
    local = np.where(tiles_valid, local, 2 * W)
    assert (local >= 0).all() and (local <= 2 * W).all()

    # k-major column layout: column k*tile + t
    local_km = np.transpose(local, (0, 2, 1)).reshape(n_tiles, K * tile)
    valid_km = np.transpose(tiles_valid, (0, 2, 1)).reshape(n_tiles, K * tile)

    return GatherPlan(
        tile=tile,
        K=K,
        window=W,
        n_tiles=n_tiles,
        win_block=win_block.astype(np.int32),
        win_block2=win_block2.astype(np.int32),
        local_idx=local_km.astype(np.int32),
        valid=valid_km,
        src_size=src_pad,
    )
