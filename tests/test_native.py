"""Native C++ decoder vs Python oracle."""
import numpy as np
import pytest

from brotlig_tpu import native
from brotlig_tpu.refimpl.codec import encode
from brotlig_tpu.refimpl.page_encoder import encode_page

from test_roundtrip import make_data

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="no native toolchain")


class TestNativeDecode:
    @pytest.mark.parametrize("kind,n", [
        ("text", 1000), ("text", 65537), ("repetitive", 200_000),
        ("random", 80_000), ("zeros", 131072), ("structured", 150_000),
    ])
    def test_stream_roundtrip(self, kind, n):
        data = make_data(kind, n, seed=n)
        blob = encode(data)
        assert native.decode(blob) == data
        assert native.decompressed_size(blob) == n

    def test_single_thread_matches(self):
        data = make_data("text", 150_000, seed=1)
        blob = encode(data)
        assert native.decode(blob, num_threads=1) == data

    def test_page_decode(self):
        data = make_data("structured", 30_000, seed=2)
        comp = encode_page(data, is_last=True)
        assert native.decode_page(comp, len(data)) == data

    def test_corrupt_rejected(self):
        data = make_data("text", 50_000, seed=3)
        blob = bytearray(encode(data))
        blob[0] = 0xEE  # break the id byte
        with pytest.raises(ValueError):
            native.decode(bytes(blob))

    def test_preconditioned_raises(self):
        from brotlig_tpu.format import constants as C
        from brotlig_tpu.format.precondition import DataConditionParams
        rng = np.random.default_rng(0)
        size = 64 * 64 * 8
        tex = (rng.integers(0, 8, size) % 256).astype(np.uint8).tobytes()
        p = DataConditionParams(precondition=True, format=C.DATA_FORMAT_BC1,
                                width_in_pixels=256, height_in_pixels=256)
        blob = encode(tex, page_size=C.MIN_PAGE_SIZE, dc_params=p)
        with pytest.raises(NotImplementedError):
            native.decode(blob)

    def test_api_prefers_native(self):
        import brotlig_tpu
        data = make_data("text", 80_000, seed=4)
        blob = brotlig_tpu.encode(data)
        assert brotlig_tpu.decode(blob, backend="cpu") == data


class TestNativeEncode:
    pytestmark = pytest.mark.skipif(
        not native.available() or not native.has_encoder(),
        reason="no native encoder")

    @pytest.mark.parametrize("kind,n", [
        ("text", 300_000), ("repetitive", 150_000), ("zeros", 131072),
        ("structured", 100_000), ("random", 70_000), ("text", 0),
        ("text", 1), ("text", 65536),
    ])
    def test_native_encode_roundtrips_everywhere(self, kind, n):
        from brotlig_tpu.refimpl.codec import decode as py_decode
        data = make_data(kind, n, seed=n + 7) if n else b""
        blob = native.encode(data)
        assert native.decode(blob) == data
        assert py_decode(blob) == data

    def test_native_encode_beats_python_ratio(self):
        from brotlig_tpu.refimpl.codec import encode as py_encode
        data = make_data("text", 150_000, seed=11)
        # q11 best-of-both parse: never larger than the greedy python oracle
        assert len(native.encode(data)) <= len(py_encode(data))
        # q1 greedy path matches the oracle exactly (same parse, same codes)
        assert len(native.encode(data, quality=1)) == len(py_encode(data))

    def test_tpu_decodes_native_streams(self):
        from brotlig_tpu.ops.decode import decode_stream_jax
        data = make_data("text", 150_000, seed=12)
        assert decode_stream_jax(native.encode(data)) == data

    def test_api_uses_native_encoder(self):
        import brotlig_tpu
        data = make_data("text", 90_000, seed=13)
        blob = brotlig_tpu.encode(data)
        assert brotlig_tpu.decode(blob, backend="cpu") == data

    def test_page_size_variants(self):
        data = make_data("text", 200_000, seed=14)
        for ps in (32768, 65536, 131072):
            assert native.decode(native.encode(data, page_size=ps)) == data


class TestFeedback:
    def test_progress_and_abort(self):
        from brotlig_tpu.refimpl.codec import encode as py_encode
        from brotlig_tpu.format.errors import Aborted, MessageType
        data = make_data("text", 100_000, seed=15)
        calls = []
        py_encode(data, page_size=32768,
                  feedback=lambda t, m: calls.append((t, m)) and False)
        assert len(calls) == 4  # 4 pages
        assert all(t == MessageType.PROGRESS for t, _ in calls)
        with pytest.raises(Aborted):
            py_encode(data, page_size=32768, feedback=lambda t, m: True)


class TestFeedbackFastPaths:
    """Feedback/abort on the native pool and device batch loops
    (VERDICT round-2 item 6; reference BrotligEncoder.cpp:402-409)."""

    @pytest.mark.skipif(not native.available(), reason="no toolchain")
    def test_native_encode_feedback(self):
        from brotlig_tpu.format.errors import Aborted, MessageType
        data = make_data("text", 100_000, seed=16)
        calls = []
        out = native.encode(data, page_size=32768,
                            feedback=lambda t, m: calls.append((t, m))
                            and False)
        assert native.decode(out) == data
        assert len(calls) == 4  # one per page
        assert all(t == MessageType.PROGRESS for t, _ in calls)
        with pytest.raises(Aborted):
            native.encode(data, page_size=32768,
                          feedback=lambda t, m: True)

    @pytest.mark.skipif(not native.available(), reason="no toolchain")
    def test_api_feedback_stays_native(self):
        """api.encode with feedback must NOT silently fall back to the slow
        Python encoder (round-1 ADVICE item 3)."""
        from brotlig_tpu import api
        data = make_data("text", 100_000, seed=17)
        calls = []
        out = api.encode(data, page_size=32768,
                         feedback=lambda t, m: calls.append(1) and False)
        # native encoder announces per-page progress
        assert calls and native.decode(out) == data
        # and its (better-ratio) output matches the direct native call
        assert out == native.encode(data, page_size=32768)

    def test_tpu_encode_feedback_abort(self):
        from brotlig_tpu import api
        from brotlig_tpu.format.errors import Aborted
        data = make_data("text", 40_000, seed=18)
        calls = []
        out = api.encode(data, page_size=32768, backend="tpu",
                         feedback=lambda t, m: calls.append(m) and False)
        assert calls and api.decode(out) == data
        with pytest.raises(Aborted):
            api.encode(data, page_size=32768, backend="tpu",
                       feedback=lambda t, m: True)


class TestCorruptAllocationGuard:
    @pytest.mark.skipif(not native.available(), reason="no toolchain")
    def test_truncated_table_rejected_before_alloc(self):
        """An 8-byte header claiming 65535 pages must fail the table-extent
        check instead of allocating ~8.5 GB (round-1 ADVICE item 4)."""
        import struct
        hdr = bytes([5, 5 ^ 0xFF, 0xFF, 0xFF]) + struct.pack("<I", 2)
        with pytest.raises(ValueError):
            native.decode(hdr)
