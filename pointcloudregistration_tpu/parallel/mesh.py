"""Device-mesh construction for the 2-D (pairs, blocks) layout.

The framework's parallel design (SURVEY.md §2.8, new — the reference is
strictly single-GPU): registration *pairs* are the data-parallel axis
(DCN-friendly, embarrassingly parallel); *point blocks* within a pair are the
model/sequence-parallel axis (ICI collectives: ring NN search, psum'd
Procrustes reductions).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

PAIRS_AXIS = "pairs"
BLOCKS_AXIS = "blocks"


def make_mesh(n_pairs: int | None = None, n_blocks: int | None = None,
              devices=None) -> Mesh:
    """Build a (pairs, blocks) mesh over the available devices.

    Defaults: all devices on the pairs axis (pure DP) unless n_blocks given.
    """
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if n_blocks is None and n_pairs is None:
        n_pairs, n_blocks = n, 1
    elif n_pairs is None:
        n_pairs = n // n_blocks
    elif n_blocks is None:
        n_blocks = n // n_pairs
    assert n_pairs * n_blocks == n, (n_pairs, n_blocks, n)
    arr = np.asarray(devices).reshape(n_pairs, n_blocks)
    return Mesh(arr, (PAIRS_AXIS, BLOCKS_AXIS))


def pair_sharding(mesh: Mesh) -> NamedSharding:
    """(B, ...) arrays sharded over pairs, replicated over blocks."""
    return NamedSharding(mesh, P(PAIRS_AXIS))


def point_sharding(mesh: Mesh) -> NamedSharding:
    """(B, N, ...) arrays sharded over pairs AND point blocks."""
    return NamedSharding(mesh, P(PAIRS_AXIS, BLOCKS_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
