"""Host-side planning for windowed Pallas gathers.

The TPU has no hardware gather: the Pallas kernels express every irregular
mesh access as a **one-hot contraction on the MXU** against a VMEM-resident
*window* of the source array.  That requires index locality: for each tile of
output entities, all source indices must fall inside a bounded, 128-aligned
window.  The mesh generator's row-major numbering (and, in general, any
bandwidth-reducing ordering such as RCM) provides it; this module verifies it
per mesh and precomputes:

* ``win_block``  [T]     — first 128-lane block of each tile's window
* ``local_idx``  [T, C]  — source indices rebased to the tile's window

The window is ``nblocks`` consecutive 128-wide blocks starting at
``win_block[i] * block`` — sized to the actual index span (the one-hot
contraction cost is linear in window width, so fine granularity matters:
a power-of-two window would process up to ~3x more source columns than the
span needs).

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

BLOCK = 128  # lane-granular window block width


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@dataclasses.dataclass
class GatherPlan:
    """Windowed gather of K source values per output entity.

    Each tile reads ``nblocks`` consecutive 128-wide blocks starting at
    ``win_block[i]`` (in units of BLOCK).  ``local_idx`` is rebased to
    ``win_block[i] * BLOCK`` and lies in [0, nblocks * BLOCK); invalid slots
    carry the sentinel ``nblocks * BLOCK`` (one position past the window, so
    a one-hot over the window selects nothing — or the kernel's appended
    neutral column block, when it provides one)."""

    tile: int  # output entities per tile
    K: int  # gathered values per entity
    block: int  # window block width (BLOCK)
    nblocks: int  # J: consecutive blocks per tile window
    n_tiles: int
    win_block: np.ndarray  # [T] int32, first block (units of BLOCK)
    local_idx: np.ndarray  # [T, K*tile] int32 (k-major), in [0, J*BLOCK]
    valid: np.ndarray  # [T, K*tile] bool
    src_size: int  # minimum padded source length the windows index into

    @property
    def window(self) -> int:
        """Total window width in source columns (J * BLOCK)."""
        return self.nblocks * self.block


def build_gather_plan(idx: np.ndarray, valid: np.ndarray, tile: int,
                      src_size: int, min_blocks: int = 1) -> GatherPlan:
    """idx: [M, K] source indices per output entity (garbage where ~valid).

    nblocks = max over tiles of the block count covering that tile's index
    span (>= min_blocks).  Raises if the window exceeds the source size
    (no locality in the mesh ordering — reorder the mesh or fall back to
    the XLA path)."""
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

    win_block = mins // BLOCK
    last_block = maxs // BLOCK
    J = max(int((last_block - win_block).max()) + 1, min_blocks)
    W = J * BLOCK
    # locality guard: on meshes large enough that windowing matters, a window
    # covering (nearly) the whole source means the ordering has no locality —
    # reorder (mesh/ordering.py) instead of silently degrading to full scans
    if W >= _round_up(src_size, BLOCK) and src_size >= 8 * tile:
        raise ValueError(
            f"gather window {W} spans the whole source ({src_size}): "
            "mesh ordering lacks locality"
        )
    src_pad = _round_up(src_size, BLOCK) + J * BLOCK

    # invalid slots get the sentinel index J*BLOCK
    local = tiles_idx - (win_block * BLOCK)[:, None, None]
    local = np.where(tiles_valid, local, W)
    assert (local >= 0).all() and (local <= W).all()

    # k-major column layout: column k*tile + t
    local_km = np.transpose(local, (0, 2, 1)).reshape(n_tiles, K * tile)
    valid_km = np.transpose(tiles_valid, (0, 2, 1)).reshape(n_tiles, K * tile)

    return GatherPlan(
        tile=tile,
        K=K,
        block=BLOCK,
        nblocks=J,
        n_tiles=n_tiles,
        win_block=win_block.astype(np.int32),
        local_idx=local_km.astype(np.int32),
        valid=valid_km,
        src_size=src_pad,
    )
