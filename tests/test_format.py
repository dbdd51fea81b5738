"""Unit tests for the format layer: bit I/O, LUTs, RLE, Huffman, headers."""
import numpy as np
import pytest

from brotlig_tpu.format import constants as C
from brotlig_tpu.format import lut
from brotlig_tpu.format.bitio import BitReaderLSB, BitWriterLSB
from brotlig_tpu.format.headers import (StreamHeader, PreconditionHeader,
                                        pack_page_table, unpack_page_table)
from brotlig_tpu.format.huffman import (build_decode_table, canonical_codes,
                                        canonical_codes_lsb,
                                        load_table_lengths,
                                        build_and_store_table,
                                        package_merge_lengths, reverse_bits)
from brotlig_tpu.format.rle import compute_rle_codes, decode_rle_codes
from brotlig_tpu.format.swizzle import Deswizzler, Swizzler


class TestBitIO:
    def test_roundtrip_random(self):
        rng = np.random.default_rng(0)
        w = BitWriterLSB()
        fields = []
        for _ in range(1000):
            n = int(rng.integers(0, 25))
            v = int(rng.integers(0, 1 << n)) if n else 0
            fields.append((n, v))
            w.write(n, v)
        r = BitReaderLSB(w.getvalue())
        for n, v in fields:
            assert r.read(n) == v

    def test_lsb_order(self):
        w = BitWriterLSB()
        w.write(3, 0b101)
        w.write(5, 0b11010)
        # byte = 11010_101
        assert w.getvalue() == bytes([0b11010101])

    def test_align(self):
        w = BitWriterLSB()
        w.write(5, 31)
        w.align_to_dword()
        assert w.bitpos == 32

    def test_read_past_end(self):
        r = BitReaderLSB(b"\xff")
        assert r.read(16) == 0x00FF


class TestLut:
    def test_cmd_lut_bijection(self):
        # every cmd 0..703 decodes to codes that re-encode to the same cmd
        for cmd in range(C.NUM_COMMAND_SYMBOLS):
            ic = int(lut.CMD_INSERT_CODE[cmd])
            cc = int(lut.CMD_COPY_CODE[cmd])
            use_last = cmd < 128
            assert lut.combine_length_codes(ic, cc, use_last) == cmd

    def test_length_codes_cover_bases(self):
        for code in range(24):
            base = int(lut.INSERT_BASE[code])
            assert lut.get_insert_length_code(base) == code
            top = base + (1 << int(lut.INSERT_EXTRA[code])) - 1
            assert lut.get_insert_length_code(top) == code
        for code in range(24):
            base = int(lut.COPY_BASE[code])
            assert lut.get_copy_length_code(base) == code

    def test_distance_roundtrip(self):
        for npostfix in range(4):
            for ndirect_msb in range(16):
                ndirect = ndirect_msb << npostfix
                for dist in list(range(1, 70)) + [127, 128, 1000, 65535,
                                                  131071]:
                    sym, nbits, extra = lut.encode_distance(
                        dist, npostfix, ndirect)
                    assert sym < C.NUM_DISTANCE_SYMBOLS
                    assert lut.distance_symbol_extra_bits(
                        sym, npostfix, ndirect) == nbits
                    got = lut.decode_distance_symbol(
                        sym, extra, npostfix, ndirect)
                    assert got == dist, (dist, npostfix, ndirect)


class TestRle:
    @pytest.mark.parametrize("seed", range(8))
    def test_roundtrip_random(self, seed):
        rng = np.random.default_rng(seed)
        # runs of random lengths incl. zeros
        lengths = []
        while len(lengths) < 728:
            val = int(rng.integers(0, 16))
            run = int(rng.integers(1, 30))
            lengths.extend([val] * run)
        lengths = np.asarray(lengths[:728], dtype=np.uint8)
        codes, extra = compute_rle_codes(lengths)
        assert (codes <= 17).all()
        back = decode_rle_codes(codes, extra, 728)
        np.testing.assert_array_equal(back, lengths)

    def test_all_zero_tail(self):
        lengths = np.zeros(544, dtype=np.uint8)
        lengths[0] = 1
        lengths[1] = 1
        codes, extra = compute_rle_codes(lengths)
        back = decode_rle_codes(codes, extra, 544)
        np.testing.assert_array_equal(back, lengths)


class TestHuffman:
    def test_reverse_bits(self):
        assert reverse_bits(0b1011, 4) == 0b1101
        assert reverse_bits(1, 15) == 1 << 14

    @pytest.mark.parametrize("seed", range(6))
    def test_package_merge_optimal_kraft(self, seed):
        rng = np.random.default_rng(seed)
        hist = rng.integers(0, 1000, size=256)
        hist[rng.integers(0, 256, size=100)] = 0
        if hist.sum() == 0:
            hist[0] = 1
        lengths = package_merge_lengths(hist)
        used = hist > 0
        assert (lengths[~used] == 0).all()
        if used.sum() > 1:
            assert (lengths[used] > 0).all()
            assert lengths.max() <= 15
            assert np.isclose((0.5 ** lengths[used].astype(float)).sum(), 1.0)

    def test_package_merge_depth_limit_binds(self):
        # exponential histogram would want depth > 15 unlimited
        hist = np.array([1 << i for i in range(40, 0, -1)] + [1, 1])
        lengths = package_merge_lengths(hist, 15)
        assert lengths.max() == 15
        assert np.isclose(
            (0.5 ** lengths[lengths > 0].astype(float)).sum(), 1.0)

    def test_decode_table_matches_codes(self):
        rng = np.random.default_rng(1)
        hist = rng.integers(1, 100, size=300)
        lengths = package_merge_lengths(hist)
        codes = canonical_codes(lengths)
        syms, lens = build_decode_table(lengths, 15)
        for sym in range(300):
            ln = int(lengths[sym])
            idx = int(codes[sym]) << (15 - ln)
            assert int(syms[idx]) == sym
            assert int(lens[idx]) == ln

    @pytest.mark.parametrize("count,alphabet", [
        (1, 256), (2, 256), (3, 544), (4, 728), (5, 256), (40, 728),
        (256, 256), (544, 544),
    ])
    def test_store_load_roundtrip(self, count, alphabet):
        rng = np.random.default_rng(count)
        hist = np.zeros(alphabet, dtype=np.int64)
        idx = rng.choice(alphabet, size=count, replace=False)
        hist[idx] = rng.integers(1, 1000, size=count)
        swz = Swizzler()
        codes, lengths = build_and_store_table(hist, alphabet, swz)
        swz.append_to_header(8, 0)  # dummy page header
        swz.append_bitstream_sizes()
        page = swz.serialize()

        # parse back: recompute stream offsets like the page decoder
        from brotlig_tpu.refimpl.page_decoder import parse_page_header
        _, _, _, offsets = parse_page_header(page)
        reader = Deswizzler(page, offsets)
        got_lengths, trivial = load_table_lengths(reader, alphabet)
        if count <= 1:
            assert trivial == int(idx[0]) if count else 0
        else:
            np.testing.assert_array_equal(got_lengths, lengths)

    def test_encoded_symbols_decode(self):
        # write symbols with the encoder codes, read via the decode table
        rng = np.random.default_rng(7)
        hist = rng.integers(0, 50, size=256)
        hist[5] = 1000
        lengths = package_merge_lengths(hist)
        codes_lsb = canonical_codes_lsb(lengths)
        syms_t, lens_t = build_decode_table(lengths, 15)
        w = BitWriterLSB()
        symbols = [int(s) for s in
                   rng.choice(np.flatnonzero(hist), size=200)]
        for s in symbols:
            w.write(int(lengths[s]), int(codes_lsb[s]))
        r = BitReaderLSB(w.getvalue())
        for s in symbols:
            idx = reverse_bits(r.peek(15), 15)
            assert int(syms_t[idx]) == s
            r.consume(int(lens_t[idx]))


class TestHeaders:
    def test_stream_header_roundtrip(self):
        h = StreamHeader.for_input(1_000_000, 65536, True)
        assert h.num_pages == 16
        assert h.uncompressed_size == 1_000_000
        h2 = StreamHeader.unpack(h.pack())
        assert h2 == h
        assert len(h.pack()) == 8

    def test_stream_header_exact_multiple(self):
        h = StreamHeader.for_input(2 * 65536, 65536, False)
        assert h.num_pages == 2 and h.last_page_size == 0
        assert h.uncompressed_size == 2 * 65536

    def test_precondition_header_roundtrip(self):
        h = PreconditionHeader(True, False, 128, 64, C.DATA_FORMAT_BC1,
                               3, 1024)
        h2 = PreconditionHeader.unpack(h.pack())
        assert h2 == h
        assert len(h.pack()) == 8

    def test_page_table(self):
        sizes = [100, 300, 50]
        data = pack_page_table(sizes)
        offsets, got = unpack_page_table(data, 3)
        assert list(offsets) == [0, 100, 400]
        assert list(got) == [100, 300, 50]

    def test_page_table_single(self):
        data = pack_page_table([123])
        offsets, got = unpack_page_table(data, 1)
        assert list(offsets) == [0]
        assert list(got) == [123]


class TestSwizzler:
    def test_size_table_self_describing(self):
        rng = np.random.default_rng(3)
        swz = Swizzler()
        for i in range(32):
            for _ in range(int(rng.integers(1, 400))):
                swz.append(7, int(rng.integers(0, 128)))
            swz.bs_switch()
        swz.append_to_header(8, 0xAB)
        swz.append_bitstream_sizes()
        out = swz.serialize()
        from brotlig_tpu.refimpl.page_decoder import parse_page_header
        _, _, _, offsets = parse_page_header(out)
        # offsets must land exactly at each stream's bytes
        lens = [w.nbytes() for w in swz.writers]
        expect = []
        pos = offsets[0]
        for ln in lens:
            expect.append(pos)
            pos += ln
        assert offsets == expect
        assert len(out) % 4 == 0
