"""Device-side BCn post-processing: per-page delta decode + decondition.

The reference decoder deconditions with a per-byte address transform inside
the page loop (PageDecoder.cpp:243-265) and delta-decodes with a serial
prefix loop (:467-471). Both are pure dataflow here:

* delta decode — a single global cumsum with segment-start subtraction
  (the per-span prefix sum falls out of `c[i] - c[start-1]`, contiguous
  spans make cross-span leakage cancel);
* decondition — one gather through the inverse of the shared condition
  index map (format/precondition.py::build_cond_map).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..format.precondition import (DataConditionParams, _color_intersections,
                                   build_cond_map)

I32 = jnp.int32


@jax.jit
def _delta_decode_device(data_u8, start_mark, in_span):
    x = data_u8.astype(I32)
    c = jnp.cumsum(x)
    iota = jnp.arange(x.shape[0], dtype=I32)
    seg_start = jax.lax.cummax(jnp.where(start_mark, iota, -1))
    c_before = jnp.where(seg_start > 0,
                         jnp.take(c, jnp.clip(seg_start - 1, 0, None)), 0)
    decoded = (c - c_before) & 255
    return jnp.where(in_span, decoded, x).astype(jnp.uint8)


@jax.jit
def _gather_u8(data_u8, idx, valid):
    out = jnp.take(data_u8, idx)
    return jnp.where(valid, out, 0).astype(jnp.uint8)


@jax.jit
def _delta_encode_device(data_u8, start_mark, in_span):
    """Inverse of _delta_decode_device: per-span byte differences.

    Ref PageEncoder.cpp:576-612 walks each color span serially; here it is
    one shifted subtraction, keeping each span's first byte verbatim."""
    x = data_u8.astype(I32)
    prev = jnp.concatenate([jnp.zeros(1, I32), x[:-1]])
    d = (x - prev) & 255
    keep = (~in_span) | start_mark
    return jnp.where(keep, x, d).astype(jnp.uint8)


def preprocess_device(data: bytes, params: DataConditionParams,
                      page_size: int):
    """Condition (forward gather) + per-page delta encode on device.

    The encode-side mirror of postprocess_device. Returns
    (conditioned bytes, delta-encoded bytes, per-page isdelta flags):
    pages feed the encoder from the delta form, but a raw-page fallback
    must store the conditioned NON-delta bytes (the decoder only
    delta-decodes compressed pages — ref PageDecoder.cpp:70-76).
    """
    n = len(data)
    x = jnp.asarray(np.frombuffer(data, np.uint8))

    cond_map = build_cond_map(params)
    m = len(cond_map)
    idx = np.zeros(n, dtype=np.int32)
    idx[:m] = cond_map
    valid = np.zeros(n, dtype=bool)
    valid[:m] = True
    cond = _gather_u8(x, jnp.asarray(idx), jnp.asarray(valid))

    num_pages = (n + page_size - 1) // page_size
    isdelta = [False] * num_pages
    delta = cond
    if params.delta_encode:
        spans = delta_spans(params, n, page_size)
        if spans:
            start_mark = np.zeros(n, dtype=bool)
            cover = np.zeros(n + 1, dtype=np.int32)
            for s, e in spans:
                start_mark[s] = True
                cover[s] += 1
                cover[e] -= 1
                isdelta[s // page_size] = True
            in_span = np.cumsum(cover[:-1]) > 0
            delta = _delta_encode_device(cond, jnp.asarray(start_mark),
                                         jnp.asarray(in_span))
    return (np.asarray(cond).tobytes(), np.asarray(delta).tobytes(), isdelta)


def delta_spans(params: DataConditionParams, total: int, page_size: int):
    """Absolute (start, end) delta spans: color-substream x page overlaps."""
    spans = []
    for pstart in range(0, total, page_size):
        pend = min(pstart + page_size, total)
        for s, e in _color_intersections(pstart, pend, params):
            spans.append((pstart + s, pstart + e))
    return spans


def postprocess_device(conditioned: bytes, params: DataConditionParams,
                       page_size: int, isdelta_pages=None) -> bytes:
    """Delta-decode (where flagged) + decondition on the default device.

    isdelta_pages: optional set of page indices whose pages were
    delta-encoded (None = all pages, matching encoders that always delta).
    """
    n = len(conditioned)
    x = jnp.asarray(np.frombuffer(conditioned, np.uint8))

    spans = [
        (s, e) for (s, e) in delta_spans(params, n, page_size)
        if isdelta_pages is None or (s // page_size) in isdelta_pages
    ]
    if spans:
        start_mark = np.zeros(n, dtype=bool)
        cover = np.zeros(n + 1, dtype=np.int32)
        for s, e in spans:
            start_mark[s] = True
            cover[s] += 1
            cover[e] -= 1
        in_span = np.cumsum(cover[:-1]) > 0
        x = _delta_decode_device(x, jnp.asarray(start_mark),
                                 jnp.asarray(in_span))

    cond_map = build_cond_map(params)
    m = len(cond_map)
    inv = np.zeros(n, dtype=np.int32)
    inv[cond_map] = np.arange(m, dtype=np.int32)
    valid = np.zeros(n, dtype=bool)
    valid[cond_map] = True
    out = _gather_u8(x, jnp.asarray(inv), jnp.asarray(valid))
    return np.asarray(out).tobytes()
