"""Progressive orderings.

Reference slot: Tools.SpaceFillingSeries (Util/Tools.cs:106-129), which
enumerates interlace slice offsets coarse-to-fine (0, then ~L/2, then the
quarters, ...) so a progressive interlaced trace refines evenly instead of
sweeping top-to-bottom.

TPU-native redesign: the same coarse-to-fine property comes from ordering
offsets by their van der Corput radical inverse — a closed form instead of
the reference's seen-set scan, trivially precomputable on the host.
"""

from __future__ import annotations


def _radical_inverse_base2(i: int, bits: int = 32) -> float:
    rev = 0
    for _ in range(bits):
        rev = (rev << 1) | (i & 1)
        i >>= 1
    return rev / float(1 << bits)


def space_filling_series(length: int) -> list[int]:
    """Coarse-to-fine permutation of range(length); element 0 is first."""
    if length <= 0:
        return []
    return sorted(range(length), key=lambda i: _radical_inverse_base2(i))
