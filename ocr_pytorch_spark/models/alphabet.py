"""Recognition alphabet + CTC label codec.

The reference ships a 5834-char pickled alphabet (recognize/alphabet.pkl,
loaded via recognize/keys.py:21-23) and builds ``nclass = len(alphabet)+1``
with class 0 reserved for the CTC blank
(recognize/crnn_recognizer.py:48-53,104).  The fixture alphabet keeps the
same structure over the 95 printable ASCII chars (torch/PIL/checkpoints are
unavailable in-sandbox — FIXTURES.md §3).
"""

from __future__ import annotations

import numpy as np

# chr(32)..chr(126): space through '~', 95 chars.
ALPHABET: str = "".join(chr(c) for c in range(32, 127))
NCLASS: int = len(ALPHABET) + 1  # +1 CTC blank (class 0)


def encode(text: str) -> list[int]:
    """char -> index+1; OOV -> 0 (crnn_recognizer.py:56-69)."""
    return [ALPHABET.index(ch) + 1 if ch in ALPHABET else 0 for ch in text]


def ctc_collapse(codes: np.ndarray) -> str:
    """Greedy CTC decode of per-timestep argmax codes
    (crnn_recognizer.py:79-83): keep t[i] iff t[i]!=0 and t[i]!=t[i-1],
    then map k -> alphabet[k-1].  Vectorized lag-compare."""
    codes = np.asarray(codes)
    if codes.size == 0:
        return ""
    prev = np.concatenate(([0], codes[:-1]))
    keep = (codes != 0) & (codes != prev)
    kept = codes[keep]
    return "".join(ALPHABET[k - 1] for k in kept)
