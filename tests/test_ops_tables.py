"""Batched JAX table loading vs the scalar oracle, on real encoded pages."""
import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from brotlig_tpu.format import constants as C
from brotlig_tpu.format.huffman import load_table_lengths
from brotlig_tpu.format.swizzle import Deswizzler
from brotlig_tpu.ops import tables as T
from brotlig_tpu.refimpl.page_decoder import parse_page_header
from brotlig_tpu.refimpl.page_encoder import encode_page


def make_pages():
    """Encode a set of pages exercising all three table storage modes."""
    rng = np.random.default_rng(42)
    pages = []
    # text -> complex tables
    words = [b"alpha ", b"beta ", b"gamma ", b"delta ", b"epsilon "]
    txt = bytearray()
    while len(txt) < 40000:
        txt += words[int(rng.integers(0, len(words)))]
    pages.append(bytes(txt))
    # zeros -> trivial literal table
    pages.append(bytes(30000))
    # two-symbol data -> simple tables
    two = rng.choice([65, 66], size=20000, p=[0.8, 0.2]).astype(np.uint8)
    pages.append(two.tobytes())
    # few distinct symbols
    four = rng.choice([1, 2, 3, 7], size=25000,
                      p=[0.6, 0.2, 0.15, 0.05]).astype(np.uint8)
    pages.append(four.tobytes())
    # structured
    a = (np.arange(50000) // 128 % 17).astype(np.uint8)
    pages.append(a.tobytes())
    comp = []
    for p in pages:
        c = encode_page(p, is_last=True)
        assert c is not None
        comp.append((c, len(p)))
    return comp


@pytest.fixture(scope="module")
def encoded_pages():
    return make_pages()


def batch_words(comp_pages):
    max_w = max((len(c) + 3) // 4 for c, _ in comp_pages) + 2
    P = len(comp_pages)
    words = np.zeros((P, max_w), dtype=np.uint32)
    sizes = np.zeros(P, dtype=np.int32)
    for i, (c, _) in enumerate(comp_pages):
        buf = np.zeros(max_w * 4, dtype=np.uint8)
        buf[: len(c)] = np.frombuffer(c, dtype=np.uint8)
        words[i] = buf.view(np.uint32)
        sizes[i] = len(c)
    return jnp.asarray(words), jnp.asarray(sizes)


class TestHeaderParse:
    def test_matches_oracle(self, encoded_pages):
        words, sizes = batch_words(encoded_pages)
        npf, nd, isd, lane_bp = T.parse_page_headers(words, sizes)
        for i, (c, _) in enumerate(encoded_pages):
            o_npf, o_nd, o_isd, o_offsets = parse_page_header(c)
            assert int(npf[i]) == o_npf
            assert int(nd[i]) == o_nd
            assert bool(isd[i]) == o_isd
            np.testing.assert_array_equal(
                np.asarray(lane_bp[i]) // 8, o_offsets)
            assert (np.asarray(lane_bp[i]) % 8 == 0).all()


class TestBitLength:
    def test_matches_python(self):
        vals = np.array([0, 1, 2, 3, 4, 7, 8, 255, 256, 65535, 2**31 - 1])
        got = np.asarray(T.bit_length(jnp.asarray(vals, dtype=jnp.int32)))
        expect = [int(v).bit_length() for v in vals]
        np.testing.assert_array_equal(got, expect)


class TestTableLoad:
    def _oracle_tables(self, page_bytes):
        """Load all three tables with the scalar oracle; also return the
        per-stream bit positions after each table."""
        _, _, _, offsets = parse_page_header(page_bytes)
        reader = Deswizzler(page_bytes, offsets)
        out = []
        for alphabet in (C.NUM_COMMAND_SYMBOLS_EFFECTIVE,
                         C.NUM_DISTANCE_SYMBOLS, C.NUM_LITERAL_SYMBOLS):
            lengths, trivial = load_table_lengths(reader, alphabet)
            bitpos = [r.bitpos for r in reader.readers]
            out.append((lengths, trivial, list(bitpos)))
        return out

    def test_all_tables_match_oracle(self, encoded_pages):
        words, sizes = batch_words(encoded_pages)
        _, _, _, lane_bp = T.parse_page_headers(words, sizes)
        oracle = [self._oracle_tables(c) for c, _ in encoded_pages]
        bp = lane_bp
        for ti, alphabet in enumerate((C.NUM_COMMAND_SYMBOLS_EFFECTIVE,
                                       C.NUM_DISTANCE_SYMBOLS,
                                       C.NUM_LITERAL_SYMBOLS)):
            lengths, trivial, bp = T.load_table(words, bp, alphabet)
            for p in range(len(encoded_pages)):
                o_lengths, o_trivial, o_bitpos = oracle[p][ti]
                if o_trivial is not None:
                    assert int(trivial[p]) == o_trivial, (p, ti)
                else:
                    assert int(trivial[p]) == -1, (p, ti)
                    np.testing.assert_array_equal(
                        np.asarray(lengths[p]), o_lengths,
                        err_msg=f"page {p} table {ti}")
                np.testing.assert_array_equal(
                    np.asarray(bp[p]), o_bitpos,
                    err_msg=f"page {p} table {ti} bitpos")


class TestSearchDecode:
    def test_decode_matches_flat_table(self):
        from brotlig_tpu.format.huffman import (build_decode_table,
                                                package_merge_lengths,
                                                canonical_codes)
        rng = np.random.default_rng(3)
        hist = rng.integers(0, 200, size=300)
        hist[7] = 5000
        lengths = package_merge_lengths(hist)
        syms_flat, lens_flat = build_decode_table(lengths, 15)
        search = T.build_search(
            jnp.asarray(lengths, dtype=jnp.int32)[None, :], 15, 15)
        windows = rng.integers(0, 1 << 15, size=500).astype(np.int32)
        sym, ln = T.search_decode(search, jnp.asarray(windows)[None, :],
                                  15, 15)
        np.testing.assert_array_equal(np.asarray(sym)[0],
                                      syms_flat[windows])
        np.testing.assert_array_equal(np.asarray(ln)[0],
                                      lens_flat[windows])
