"""ASCII rendering (reference: `/root/reference/src/game/renderer.py`).

Host-side presentation helpers for play/eval CLIs; operates on NumPy
snapshots of device state.
"""
from __future__ import annotations

from typing import Iterable, Optional, Sequence

import numpy as np

from .engine import pieces as P

FILLED = "█"
EMPTY = "·"
GHOST = "○"
BAD = "✗"


def render_board(board: np.ndarray, show_coords: bool = True) -> str:
    """Board grid with coordinates (`renderer.py:29-65`)."""
    size = board.shape[0]
    lines = []
    if show_coords:
        lines.append("  " + " ".join(str(i) for i in range(size)))
        lines.append("  " + "-" * (size * 2 - 1))
    for r in range(size):
        prefix = f"{r}|" if show_coords else ""
        row = " ".join(FILLED if board[r, c] else EMPTY for c in range(size))
        lines.append(prefix + row)
    if show_coords:
        lines.append("  " + "-" * (size * 2 - 1))
    return "\n".join(lines)


def render_piece(piece_id: int) -> str:
    """Minimal bounding-box view of one piece (`renderer.py:67-87`)."""
    arr = P.piece_shape_array(piece_id)
    return "\n".join(
        "".join("□" if c else " " for c in row) for row in arr
    )


def render_pieces(piece_ids: Sequence[int], used: Sequence[bool]) -> str:
    """The 3 current pieces side by side with used markers
    (`renderer.py:89-127`)."""
    blocks = []
    for i, (pid, u) in enumerate(zip(piece_ids, used)):
        name = P.PIECE_NAMES[pid]
        header = f"[{i}] {name}" + (" (USED)" if u else "")
        art = render_piece(pid) if not u else "(used)"
        blocks.append(header + "\n" + art)
    return "\n\n".join(blocks)


def render_board_with_placement(
    board: np.ndarray, piece_id: int, row: int, col: int
) -> str:
    """Ghost preview of a prospective placement (`renderer.py:129-183`)."""
    size = board.shape[0]
    ghost = {}
    ok = True
    for dr, dc in P.PIECE_OFFSETS[piece_id]:
        r, c = row + dr, col + dc
        if not (0 <= r < size and 0 <= c < size) or board[r, c]:
            ok = False
        if 0 <= r < size and 0 <= c < size:
            ghost[(r, c)] = True
    mark = GHOST if ok else BAD
    lines = ["  " + " ".join(str(i) for i in range(size)),
             "  " + "-" * (size * 2 - 1)]
    for r in range(size):
        cells = []
        for c in range(size):
            if (r, c) in ghost and not board[r, c]:
                cells.append(mark)
            else:
                cells.append(FILLED if board[r, c] else EMPTY)
        lines.append(f"{r}|" + " ".join(cells))
    lines.append("  " + "-" * (size * 2 - 1))
    return "\n".join(lines)


def render_game_state(
    board: np.ndarray,
    piece_ids: Sequence[int],
    used: Sequence[bool],
    score: int = 0,
    moves: int = 0,
    combo: int = 0,
    game_over: bool = False,
) -> str:
    """Full frame: board + status line + available pieces
    (`renderer.py:185-219`)."""
    status = "game_over" if game_over else "playing"
    parts = [
        render_board(board),
        f"\nScore: {score} | Moves: {moves} | Combo: {combo} | "
        f"Status: {status}",
        "\nAvailable pieces:",
    ]
    for i, (pid, u) in enumerate(zip(piece_ids, used)):
        tag = "USED" if u else "available"
        parts.append(f"  [{i}] {P.PIECE_NAMES[pid]} ({tag})")
    return "\n".join(parts)
