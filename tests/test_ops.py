"""Pallas kernel correctness (interpret mode on CPU vs the XLA path)."""
import jax.numpy as jnp
import numpy as np
import pytest

from bbx.engine import kernel as K
from bbx.ops.mask_kernel import TILE_N, valid_anchors_all_pieces_pallas


def test_pallas_mask_matches_xla():
    rng = np.random.default_rng(0)
    n = TILE_N * 2
    boards = (rng.random((n, 8, 8)) < rng.uniform(0.0, 0.9, (n, 1, 1)))
    board = jnp.asarray(boards.astype(np.uint8))
    ours = valid_anchors_all_pieces_pallas(board, interpret=True)
    ref = K.valid_anchors_all_pieces(board)
    np.testing.assert_array_equal(np.asarray(ours), np.asarray(ref))


def test_pallas_mask_rejects_misaligned_batch():
    with pytest.raises(AssertionError):
        valid_anchors_all_pieces_pallas(K.empty_boards(100), interpret=True)
