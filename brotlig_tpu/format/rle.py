"""RLE codec for Huffman code-length arrays (complex table storage).

Wire semantics (decoder contract, BrotligHuffmanTable.cpp:149-195):
  * symbols 0..15: literal code length (0 = unused symbol);
  * 16: repeat previous non-zero length 3..6 times (2 extra bits);
  * 17: repeat zero 3..10 times (3 extra bits);
  * "previous length" starts at 8 and is updated only by literal lengths.

The encoder reproduces the reference's exact run-splitting quirks
(BrotligUtils.cpp:76-228) so that compressed sizes stay comparable.
"""
from __future__ import annotations

import numpy as np

from . import constants as C


def _encode_zero_reps(reps, out_codes, out_extra):
    if reps == 11:
        out_codes.append(0)
        out_extra.append(0)
        reps -= 1
    if reps < 3:
        out_codes.extend([0] * reps)
        out_extra.extend([0] * reps)
        return
    while True:
        chunk = min(reps, 10)
        reps -= chunk
        out_codes.append(C.REPEAT_ZERO_CODE_LENGTH)
        out_extra.append(chunk - 3)
        if reps < 3:
            break
    out_codes.extend([0] * reps)
    out_extra.extend([0] * reps)


def _encode_nonzero_reps(prev_value, value, reps, out_codes, out_extra):
    if prev_value != value:
        out_codes.append(value)
        out_extra.append(0)
        reps -= 1
    if reps == 7:
        out_codes.append(value)
        out_extra.append(0)
        reps -= 1
    if reps < 3:
        out_codes.extend([value] * reps)
        out_extra.extend([0] * reps)
        return
    while True:
        chunk = min(reps, 6)
        reps -= chunk
        out_codes.append(C.REPEAT_PREVIOUS_CODE_LENGTH)
        out_extra.append(chunk - 3)
        if reps < 3:
            break
    out_codes.extend([value] * reps)
    out_extra.extend([0] * reps)


def compute_rle_codes(lengths):
    """Code-length array -> (codes, extra_bits) covering every position.

    Mirrors ComputeRLECodes (BrotligUtils.cpp:172-228) including the
    first-position literal and the reps==11 / reps==7 split quirks.
    """
    lengths = np.asarray(lengths)
    out_codes: list[int] = []
    out_extra: list[int] = []
    prev_value = C.INITIAL_REPEATED_CODE_LENGTH
    i = 0
    size = len(lengths)
    while i < size:
        value = int(lengths[i])
        reps = 1
        if i == 0:
            out_codes.append(value)
            out_extra.append(0)
        else:
            k = i + 1
            while k < size and int(lengths[k]) == value:
                reps += 1
                k += 1
            if value == 0:
                _encode_zero_reps(reps, out_codes, out_extra)
            else:
                _encode_nonzero_reps(prev_value, value, reps,
                                     out_codes, out_extra)
        prev_value = value
        i += reps
    return np.asarray(out_codes, dtype=np.int32), np.asarray(
        out_extra, dtype=np.int32)


def decode_rle_codes(codes, extra, alphabet_size):
    """Inverse of compute_rle_codes (for unit tests)."""
    lengths = np.zeros(alphabet_size, dtype=np.uint8)
    prev_len = C.INITIAL_REPEATED_CODE_LENGTH
    pos = 0
    for code, ex in zip(codes, extra):
        code = int(code)
        if code == C.REPEAT_PREVIOUS_CODE_LENGTH:
            reps = int(ex) + 3
            lengths[pos: pos + reps] = prev_len
            pos += reps
        elif code == C.REPEAT_ZERO_CODE_LENGTH:
            pos += int(ex) + 3
        else:
            # note: the reference decoder updates prev on ANY literal,
            # including 0 (BrotligHuffmanTable.cpp:186-191)
            lengths[pos] = code
            pos += 1
            prev_len = code
    assert pos == alphabet_size
    return lengths
