"""Pallas tables kernel vs the XLA load_table chain: exact equality.

Runs the kernel in interpret mode on CPU (tests/conftest.py pins the
default device); on hardware the same code compiles via Mosaic
(exercised by bench.py / BROTLIG_TEST_TPU runs).
"""
import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from brotlig_tpu.format import constants as C
from brotlig_tpu.ops import pallas_decode as PD
from brotlig_tpu.ops.pallas_tables import load_tables_pallas
from brotlig_tpu.ops.tables import (load_table, parse_page_headers_full,
                                    stream_view_from_interleaved)
from brotlig_tpu.refimpl.page_encoder import encode_page

from test_roundtrip import make_data
from test_ops_decode import batch


def xla_tables(words, sizes, wl):
    """The pre-round-4 XLA prologue: interleave + 3 chained load_table."""
    from brotlig_tpu.ops.tables import HEADER_WORDS
    W = words.shape[1]
    _, _, _, _, stream_bytes = parse_page_headers_full(
        words[:, :min(W, HEADER_WORDS)], sizes)
    buf3 = PD._interleave_streams(words, stream_bytes, wl)
    view, vbp0 = stream_view_from_interleaved(buf3, min(64, wl))
    bp = vbp0
    icp_len, icp_triv, bp = load_table(
        view, bp, C.NUM_COMMAND_SYMBOLS_EFFECTIVE)
    dst_len, dst_triv, bp = load_table(view, bp, C.NUM_DISTANCE_SYMBOLS)
    lit_len, lit_triv, bp = load_table(view, bp, C.NUM_LITERAL_SYMBOLS)
    return buf3, (icp_len, dst_len, lit_len), \
        (icp_triv, dst_triv, lit_triv), bp - vbp0


@pytest.mark.parametrize("kinds", [
    ["text", "repetitive", "structured", "zeros"],
    ["text2", "random", "text", "repetitive"],
])
def test_tables_kernel_matches_load_table(kinds):
    n = 32768
    datas = [make_data(k if k != "text2" else "text", 2000 + 17 * i,
                       seed=i + 5) for i, k in enumerate(kinds)]
    comps = [encode_page(d, is_last=True) for d in datas]
    keep = [c for c in comps if c is not None]
    assert len(keep) >= 3
    words, sizes = batch(keep, n)
    wl = PD.wl_bucket(PD.stream_words_hint(keep))

    buf3, lens_x, trivs_x, bp_x = xla_tables(words, sizes, wl)
    li, ld, ll, trivs_p, bp_p = load_tables_pallas(buf3, True)

    for got, want in zip((li, ld, ll), lens_x):
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
    for j, want in enumerate(trivs_x):
        np.testing.assert_array_equal(np.asarray(trivs_p[:, j]),
                                      np.asarray(want))
    np.testing.assert_array_equal(np.asarray(bp_p), np.asarray(bp_x))


def test_native_stage_pages_matches_xla_interleave():
    """Host C++ stager (native.stage_pages) vs the XLA parse+interleave:
    identical buf3 layout and page header fields."""
    from brotlig_tpu import native
    if not native.available():
        pytest.skip("no native toolchain")
    n = 32768
    kinds = ["text", "repetitive", "structured", "zeros"]
    datas = [make_data(k, 2500, seed=i + 9) for i, k in enumerate(kinds)]
    comps = [encode_page(d, is_last=True) for d in datas]
    keep = [c for c in comps if c is not None]
    words, sizes = batch(keep, n)
    wl = PD.wl_bucket(PD.stream_words_hint(keep))

    buf3_x, npf_x, ndi_x, isd_x = PD._parse_and_interleave(
        words, jnp.asarray(sizes), wl)

    payload = b"".join(keep)
    offs = np.cumsum([0] + [len(c) for c in keep[:-1]]).astype(np.uint64)
    szs = np.array([len(c) for c in keep], np.uint64)
    buf3_n, npd_n = native.stage_pages(payload, offs, szs, wl)

    np.testing.assert_array_equal(buf3_n, np.asarray(buf3_x))
    np.testing.assert_array_equal(npd_n[:, 0], np.asarray(npf_x))
    np.testing.assert_array_equal(npd_n[:, 1], np.asarray(ndi_x))
    np.testing.assert_array_equal(npd_n[:, 2], np.asarray(isd_x))


def test_tables_kernel_trivial_and_simple_modes():
    """Pages whose tables exercise the trivial / simple storage modes
    (constant + tiny-alphabet data)."""
    n = 32768
    datas = [b"\x00" * 3000, b"ababababab" * 300, bytes(range(4)) * 700]
    comps = [encode_page(d, is_last=True) for d in datas]
    keep = [c for c in comps if c is not None]
    words, sizes = batch(keep, n)
    wl = PD.wl_bucket(PD.stream_words_hint(keep))

    buf3, lens_x, trivs_x, bp_x = xla_tables(words, sizes, wl)
    li, ld, ll, trivs_p, bp_p = load_tables_pallas(buf3, True)
    for got, want in zip((li, ld, ll), lens_x):
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
    for j, want in enumerate(trivs_x):
        np.testing.assert_array_equal(np.asarray(trivs_p[:, j]),
                                      np.asarray(want))
    np.testing.assert_array_equal(np.asarray(bp_p), np.asarray(bp_x))
