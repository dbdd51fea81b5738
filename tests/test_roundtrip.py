"""Page- and stream-level roundtrip tests for the CPU oracle codec."""
import numpy as np
import pytest

from brotlig_tpu.format import constants as C
from brotlig_tpu.refimpl.codec import decode, decompressed_size, encode
from brotlig_tpu.refimpl.page_decoder import decode_page
from brotlig_tpu.refimpl.page_encoder import encode_page, find_matches


def make_data(kind: str, n: int, seed: int = 0) -> bytes:
    rng = np.random.default_rng(seed)
    if kind == "text":
        words = [b"the ", b"quick ", b"brown ", b"fox ", b"jumps ",
                 b"over ", b"lazy ", b"dog ", b"pack ", b"my ", b"box "]
        out = bytearray()
        while len(out) < n:
            out += words[int(rng.integers(0, len(words)))]
        return bytes(out[:n])
    if kind == "random":
        return rng.integers(0, 256, size=n, dtype=np.uint8).tobytes()
    if kind == "zeros":
        return bytes(n)
    if kind == "repetitive":
        pattern = rng.integers(0, 256, size=37, dtype=np.uint8).tobytes()
        return (pattern * (n // len(pattern) + 1))[:n]
    if kind == "structured":
        # BCn-like: low-entropy interleaved structure
        a = rng.integers(0, 4, size=n).astype(np.int64)
        b = np.arange(n, dtype=np.int64) // 16
        return ((a + b) % 256).astype(np.uint8).tobytes()
    raise ValueError(kind)


class TestMatcher:
    def test_commands_cover_input(self):
        data = make_data("text", 5000)
        cmds, tail = find_matches(data)
        covered = sum(i + c for i, c, _ in cmds) + tail
        assert covered == len(data)
        for ins, cpy, dist in cmds:
            assert cpy >= 4
            assert 1 <= dist
            assert cpy == 0 or dist <= len(data)

    def test_distances_valid(self):
        data = make_data("repetitive", 3000)
        cmds, _ = find_matches(data)
        pos = 0
        for ins, cpy, dist in cmds:
            pos += ins
            assert dist <= pos, "distance reaches before page start"
            pos += cpy


class TestPageRoundtrip:
    @pytest.mark.parametrize("kind", ["text", "zeros", "repetitive",
                                      "structured"])
    @pytest.mark.parametrize("n", [1, 2, 3, 100, 4096, 65536])
    def test_roundtrip(self, kind, n):
        data = make_data(kind, n, seed=n)
        comp = encode_page(data, is_last=True)
        if comp is None:
            return  # stored raw: trivially correct
        assert len(comp) < len(data)
        out, isdelta = decode_page(comp, len(data))
        assert not isdelta
        assert out == data, f"{kind}/{n}: roundtrip mismatch"

    @pytest.mark.parametrize("n", [100, 65536])
    def test_random_falls_back_to_raw(self, n):
        data = make_data("random", n)
        comp = encode_page(data, is_last=True)
        assert comp is None

    def test_not_last_page(self):
        data = make_data("text", 65536)
        comp = encode_page(data, is_last=False)
        out, _ = decode_page(comp, len(data))
        assert out == data

    @pytest.mark.parametrize("seed", range(5))
    def test_fuzz_small_pages(self, seed):
        rng = np.random.default_rng(seed)
        n = int(rng.integers(4, 2000))
        kind = ["text", "zeros", "repetitive", "structured"][seed % 4]
        data = make_data(kind, n, seed)
        comp = encode_page(data, is_last=bool(seed % 2))
        if comp is not None:
            out, _ = decode_page(comp, n)
            assert out == data


class TestStreamRoundtrip:
    @pytest.mark.parametrize("kind,n", [
        ("text", 1000), ("text", 65536), ("text", 65537),
        ("text", 200_000), ("repetitive", 300_000),
        ("zeros", 131072), ("random", 100_000), ("structured", 150_000),
    ])
    def test_roundtrip(self, kind, n):
        data = make_data(kind, n, seed=n)
        blob = encode(data)
        assert decompressed_size(blob) == n
        out = decode(blob)
        assert out == data

    def test_page_size_variants(self):
        data = make_data("text", 200_000)
        for ps in C.PAGE_SIZE_CHOICES:
            blob = encode(data, page_size=ps)
            assert decode(blob) == data

    def test_exact_page_multiple(self):
        data = make_data("text", 2 * C.DEFAULT_PAGE_SIZE)
        blob = encode(data)
        assert decode(blob) == data

    def test_compression_ratio_sane(self):
        data = make_data("text", 500_000)
        blob = encode(data)
        assert len(blob) < len(data) // 3

    def test_corrupt_magic_raises(self):
        data = make_data("text", 1000)
        blob = bytearray(encode(data))
        blob[1] ^= 0xFF
        with pytest.raises(ValueError):
            decode(bytes(blob))
