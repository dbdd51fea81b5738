"""Size-parity probe: our q11 Brotli-G vs plain brotli q11 per page, plus
a bits-decomposition of our own pages (entropy-ideal of the chosen command
stream vs actual bytes).

Backs the "Size-parity argument" table in BASELINE.md. Plain brotli is a
strictly harder target than the reference encoder: the reference emits the
same Brotli-G format (no literal context modeling, no block splits, 32-lane
padding) while plain brotli uses all three against us.

Usage: PYTHONPATH=. python tools/parity_probe.py
"""
import collections
import ctypes
import json
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

import numpy as np

from brotlig_tpu import native
from brotlig_tpu.format import lut as L
from brotlig_tpu.utils import brotli_codec

PAGE = 65536


def brotli_nocontext(data: bytes, lgwin: int = 16, q: int = 11) -> int:
    """Plain brotli with literal context modeling disabled — the closest
    public-API proxy for reference-format constraints (it still block
    splits, which Brotli-G cannot)."""
    be = ctypes.CDLL("libbrotlienc.so.1")
    be.BrotliEncoderCreateInstance.restype = ctypes.c_void_p
    be.BrotliEncoderCreateInstance.argtypes = [ctypes.c_void_p] * 3
    be.BrotliEncoderSetParameter.argtypes = [
        ctypes.c_void_p, ctypes.c_int, ctypes.c_uint32]
    be.BrotliEncoderCompressStream.restype = ctypes.c_int
    be.BrotliEncoderCompressStream.argtypes = [
        ctypes.c_void_p, ctypes.c_int,
        ctypes.POINTER(ctypes.c_size_t), ctypes.POINTER(ctypes.c_char_p),
        ctypes.POINTER(ctypes.c_size_t), ctypes.POINTER(ctypes.c_char_p),
        ctypes.POINTER(ctypes.c_size_t)]
    be.BrotliEncoderIsFinished.restype = ctypes.c_int
    be.BrotliEncoderIsFinished.argtypes = [ctypes.c_void_p]
    be.BrotliEncoderDestroyInstance.argtypes = [ctypes.c_void_p]
    st = be.BrotliEncoderCreateInstance(None, None, None)
    be.BrotliEncoderSetParameter(st, 1, q)       # QUALITY
    be.BrotliEncoderSetParameter(st, 2, lgwin)   # LGWIN
    be.BrotliEncoderSetParameter(st, 4, 1)       # DISABLE_LITERAL_CONTEXT
    inbuf = ctypes.c_char_p(data)
    avail_in = ctypes.c_size_t(len(data))
    outsz = len(data) * 2 + 1024
    outbuf = ctypes.create_string_buffer(outsz)
    next_out = ctypes.cast(outbuf, ctypes.c_char_p)
    avail_out = ctypes.c_size_t(outsz)
    total = ctypes.c_size_t(0)
    ok = be.BrotliEncoderCompressStream(
        st, 2, ctypes.byref(avail_in), ctypes.byref(inbuf),
        ctypes.byref(avail_out), ctypes.byref(next_out), ctypes.byref(total))
    assert ok and be.BrotliEncoderIsFinished(st)
    be.BrotliEncoderDestroyInstance(st)
    return total.value


def _entropy_bits(hist) -> float:
    tot = sum(hist.values())
    if not tot:
        return 0.0
    return -sum(c * math.log2(c / tot) for c in hist.values())


def _ring_code(d, ring):
    if d == ring[0]:
        return 0
    if d == ring[1]:
        return 1
    if d == ring[2]:
        return 2
    if d == ring[3]:
        return 3
    for depth in (0, 1):
        base = ring[depth]
        for k in (1, 2, 3):
            if d == base - k:
                return 4 + 8 * depth + 2 * (k - 1)
            if d == base + k:
                return 5 + 8 * depth + 2 * (k - 1)
    return None


def ideal_bits(page: bytes, ins, cpy, dist, tail: int):
    """Order-0 entropy ideal of our command stream, replaying the
    serializer's symbol assignment (ring short codes, implicit-ring0
    commands, npostfix=0/ndirect=0)."""
    ring = [4, 11, 15, 16]
    hl = collections.Counter()
    hc = collections.Counter()
    hd = collections.Counter()
    extra = 0
    pos = 0
    for i, c, dv in zip(ins.tolist(), cpy.tolist(), dist.tolist()):
        for b in page[pos:pos + i]:
            hl[b] += 1
        pos += i + c
        ic = L.get_insert_length_code(i)
        extra += L.INSERT_EXTRA[ic]
        if not c:
            continue
        sym = _ring_code(dv, ring)
        if sym is None:
            sym, nb, _ = L.encode_distance(dv, 0, 0)
            extra += nb
        cc = L.get_copy_length_code(c)
        extra += L.COPY_EXTRA[cc]
        use_last = (sym == 0 and ic < 8 and cc < 16)
        hc[L.combine_length_codes(ic, cc, use_last)] += 1
        if not use_last:
            hd[sym] += 1
        if sym != 0:
            ring[3], ring[2], ring[1], ring[0] = (
                ring[2], ring[1], ring[0], dv)
    for b in page[len(page) - tail:]:
        hl[b] += 1
    if tail:
        extra += L.INSERT_EXTRA[L.get_insert_length_code(tail)]
        hc[704 + L.get_insert_length_code(tail)] += 1
    hc[704] += 1  # sentinel
    return _entropy_bits(hl) + _entropy_bits(hc) + _entropy_bits(hd) + extra


def cases():
    from test_real_corpus import corpus
    from test_roundtrip import make_data
    return list(corpus()) + [(k, make_data(k, 262144, seed=9))
                             for k in ("text", "structured", "repetitive")]


def main():
    tot = {"in": 0, "us": 0, "br": 0}
    print(f"{'case':24s} {'in':>8s} {'ours':>8s} {'brotli-nc':>9s} "
          f"{'gap':>7s} {'coding-overhead':>15s}")
    for name, data in cases():
        tin = tus = tbr = 0
        ovh_act = ovh_ideal = 0
        for off in range(0, len(data), PAGE):
            pg = data[off:off + PAGE]
            if len(pg) < 4096:
                continue
            us = len(native.encode(pg, page_size=PAGE)) - 12
            tin += len(pg)
            tus += us
            tbr += brotli_nocontext(pg)
            if us < len(pg):  # decompose compressed pages only
                ins, cpy, dist, tail = native.parse_page(pg)
                ovh_ideal += ideal_bits(pg, ins, cpy, dist, tail) / 8
                ovh_act += us
        for k, v in zip(("in", "us", "br"), (tin, tus, tbr)):
            tot[k] += v
        ovh = (100 * (ovh_act - ovh_ideal) / ovh_act) if ovh_act else 0.0
        print(f"{name:24s} {tin:8d} {tus:8d} {tbr:9d} "
              f"{100 * (tus - tbr) / max(tbr, 1):6.2f}% {ovh:14.1f}%")
    print(f"{'TOTAL':24s} {tot['in']:8d} {tot['us']:8d} {tot['br']:9d} "
          f"{100 * (tot['us'] - tot['br']) / tot['br']:6.2f}%")
    print(json.dumps({"ours": tot["us"], "brotli_nc": tot["br"],
                      "gap_pct": round(
                          100 * (tot['us'] - tot['br']) / tot['br'], 2)}))


if __name__ == "__main__":
    main()
