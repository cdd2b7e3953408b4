"""Rubik's-cube solver bridge (TPU build).

Replaces the reference kociemba bridge
(/root/reference/robogym/utils/rubik_utils.py:1-31): `solve_fast` produces a
move sequence for a scrambled cube, used by the solver-driven goal
generators (reference envs/dactyl/goals/face_cube_solver.py,
rubik_cube_solver.py). The solver itself is the native C++ two-phase
implementation in native/rubik/two_phase.cc (built on demand); solutions are
episodic host-side data, exactly like the reference's native kociemba.

Also provides the cubelet-state <-> facelet-string conversion the reference
gets from pycuber (CubeManipulator.to_pycuber + solve_fast string surgery).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Optional, Tuple

import numpy as np

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native", "rubik",
)
_LIB_PATH = os.path.join(_NATIVE_DIR, "librubik.so")
_SRC_PATH = os.path.join(_NATIVE_DIR, "two_phase.cc")

SOLVED_FACELETS = "UUUUUUUUURRRRRRRRRFFFFFFFFFDDDDDDDDDLLLLLLLLLBBBBBBBBB"

# move letter -> (axis, side) in the cube_manipulator convention
# (axes per rubik_utils.py docstring: +X Right, -Y Front, +Z Up)
MOVE_FACE = {
    "U": (2, 1), "D": (2, 0), "R": (0, 1), "L": (0, 0),
    "B": (1, 1), "F": (1, 0),
}

_lib = None


def _build_library():
    subprocess.run(
        ["g++", "-O2", "-shared", "-fPIC", "-o", _LIB_PATH, _SRC_PATH],
        check=True, capture_output=True,
    )


def get_library():
    global _lib
    if _lib is None:
        if not os.path.exists(_LIB_PATH) or (
            os.path.exists(_SRC_PATH)
            and os.path.getmtime(_SRC_PATH) > os.path.getmtime(_LIB_PATH)
        ):
            _build_library()
        lib = ctypes.CDLL(_LIB_PATH)
        lib.rubik_solve.argtypes = [
            ctypes.c_char_p, ctypes.c_int, ctypes.c_char_p, ctypes.c_int
        ]
        lib.rubik_solve.restype = ctypes.c_int
        lib.rubik_apply.argtypes = [ctypes.c_char_p] * 2 + [ctypes.c_char_p]
        lib.rubik_apply.restype = ctypes.c_int
        lib.rubik_selftest.restype = ctypes.c_int
        lib.rubik_init()
        _lib = lib
    return _lib


def solve_fast(facelets: str, max_depth: int = 24) -> Optional[str]:
    """Two-phase solve; returns a space-separated move string like
    "U R2 F'" or None (reference solve_fast returns kociemba.solve).

    Cheap sanity checks run first: an illegal facelet state (bad color
    counts / wrong centers) would otherwise send the search into an
    exhaustive, near-unbounded walk before giving up."""
    if len(facelets) != 54:
        return None
    for i, face in enumerate("URFDLB"):
        if facelets.count(face) != 9 or facelets[9 * i + 4] != face:
            return None
    lib = get_library()
    out = ctypes.create_string_buffer(512)
    n = lib.rubik_solve(facelets.encode(), max_depth, out, 512)
    if n < 0:
        return None
    return out.value.decode()


def apply_moves(facelets: str, moves: str) -> Optional[str]:
    lib = get_library()
    out = ctypes.create_string_buffer(64)
    if lib.rubik_apply(facelets.encode(), moves.encode(), out) != 0:
        return None
    return out.value.decode()


# ---------------------------------------------------------------------------
# cubelet (euler-hinge) state <-> facelet string
# ---------------------------------------------------------------------------

# facelet index -> (world cubelet coordinate, world outward normal), using
# the kociemba layout matched to the cube axes (+X Right, -Y Front, +Z Up)
def _facelet_table():
    table = []

    def face(normal, origin, drow, dcol):
        for r in range(3):
            for c in range(3):
                coord = np.array(origin) + r * np.array(drow) + c * np.array(dcol)
                table.append((coord, np.array(normal)))

    face((0, 0, 1), (-1, 1, 1), (0, -1, 0), (1, 0, 0))     # U: row back->front
    face((1, 0, 0), (1, -1, 1), (0, 0, -1), (0, 1, 0))     # R: row top->bot, col front->back
    face((0, -1, 0), (-1, -1, 1), (0, 0, -1), (1, 0, 0))   # F
    face((0, 0, -1), (-1, -1, -1), (0, 1, 0), (1, 0, 0))   # D: row front->back
    face((-1, 0, 0), (-1, 1, 1), (0, 0, -1), (0, -1, 0))   # L: col back->front
    face((0, 1, 0), (1, 1, 1), (0, 0, -1), (-1, 0, 0))     # B: col right->left
    return table


_FACELET_TABLE = _facelet_table()
_AXIS_FACE = {
    (0, 0, 1): "U", (0, 0, -1): "D", (1, 0, 0): "R",
    (-1, 0, 0): "L", (0, -1, 0): "F", (0, 1, 0): "B",
}


def cubelets_to_facelets(coords: np.ndarray, mats: np.ndarray) -> str:
    """Facelet string from the 20 cubelets' home coords (20, 3) and current
    rotation matrices (20, 3, 3) (signed permutations after snapping)."""
    mats = np.round(np.asarray(mats)).astype(int)
    coords = np.round(np.asarray(coords)).astype(int)
    cur = np.einsum("cij,cj->ci", mats, coords)
    lookup = {tuple(c): i for i, c in enumerate(cur)}
    out = []
    for coord, normal in _FACELET_TABLE:
        key = tuple(int(x) for x in coord)
        if key not in lookup:  # face center cap
            out.append(_AXIS_FACE[tuple(int(x) for x in normal)])
            continue
        i = lookup[key]
        home_normal = mats[i].T @ normal
        out.append(_AXIS_FACE[tuple(int(x) for x in home_normal)])
    return "".join(out)


def moves_to_face_rotations(moves: str) -> List[Tuple[int, int, float]]:
    """Move string -> [(axis, side, angle)] for
    robogym_tpu.envs.dactyl.cube_manipulator.rotate_face. Clockwise quarter
    turns viewed from outside the face are negative rotations about the
    outward +axis faces and positive about the -axis faces."""
    out = []
    for tok in moves.split():
        face = tok[0]
        axis, side = MOVE_FACE[face]
        turns = 1
        if len(tok) > 1 and tok[1] == "2":
            turns = 2
        elif len(tok) > 1 and tok[1] == "'":
            turns = -1
        # cw viewed from outside = -pi/2 about the outward axis; for the
        # negative-side faces the outward axis is -axis, so the sign flips
        sign = -1.0 if side == 1 else 1.0
        angle = sign * turns * (np.pi / 2)
        out.append((axis, side, float(angle)))
    return out
