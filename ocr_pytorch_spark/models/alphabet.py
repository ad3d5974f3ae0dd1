"""Recognition alphabet + CTC label codec.

The reference ships a 5834-char pickled alphabet (recognize/alphabet.pkl,
loaded via recognize/keys.py:21-23) and builds ``nclass = len(alphabet)+1``
with class 0 reserved for the CTC blank
(recognize/crnn_recognizer.py:48-53,104).

Two alphabets are available:

* ``ALPHABET`` (default, fixture): the 95 printable ASCII chars —
  exactly the first 95 entries of the real alphabet (it is sorted by
  codepoint, so ASCII leads).  This matches the bundled seed-42 weights
  (nclass 96).
* ``full_alphabet()``: the reference's complete 5834-char alphabet
  (95 ASCII + 5626 CJK + 113 other), checked in as a UTF-8 text
  resource generated from recognize/alphabet.pkl, giving nclass 5835 —
  the shape a real converted checkpoint (models/checkpoint.pth_to_npz)
  expects.  Pass it to encode/ctc_collapse to round-trip CJK
  transcripts.
"""

from __future__ import annotations

import os
from functools import lru_cache

import numpy as np

# chr(32)..chr(126): space through '~', 95 chars.
ALPHABET: str = "".join(chr(c) for c in range(32, 127))
NCLASS: int = len(ALPHABET) + 1  # +1 CTC blank (class 0)

_RESOURCE = os.path.join(os.path.dirname(__file__), "..", "resources",
                         "alphabet_full.txt")


@lru_cache(maxsize=1)
def full_alphabet() -> str:
    """The reference's 5834-char alphabet (recognize/alphabet.pkl)."""
    with open(_RESOURCE, encoding="utf-8") as f:
        return f.read()


def full_nclass() -> int:
    return len(full_alphabet()) + 1  # 5835, crnn_recognizer.py:104


def alphabet_for_nclass(nclass: int) -> str:
    """Pick the alphabet from a model head's class count, so a
    converted real checkpoint (nclass 5835) and the bundled fixture
    weights (nclass 96) both drop in with zero configuration."""
    if nclass == NCLASS:
        return ALPHABET
    if nclass == full_nclass():
        return full_alphabet()
    raise ValueError(
        f"no alphabet with {nclass - 1} characters (fixture {NCLASS - 1}"
        f", full {full_nclass() - 1})")


def encode(text: str, alphabet: str = ALPHABET) -> list[int]:
    """char -> index+1; OOV -> 0 (crnn_recognizer.py:56-69)."""
    idx = {ch: i + 1 for i, ch in enumerate(alphabet)}
    return [idx.get(ch, 0) for ch in text]


def ctc_collapse(codes: np.ndarray, alphabet: str = ALPHABET) -> str:
    """Greedy CTC decode of per-timestep argmax codes
    (crnn_recognizer.py:79-83): keep t[i] iff t[i]!=0 and t[i]!=t[i-1],
    then map k -> alphabet[k-1].  Vectorized lag-compare."""
    codes = np.asarray(codes)
    if codes.size == 0:
        return ""
    prev = np.concatenate(([0], codes[:-1]))
    keep = (codes != 0) & (codes != prev)
    kept = codes[keep]
    return "".join(alphabet[k - 1] for k in kept)
