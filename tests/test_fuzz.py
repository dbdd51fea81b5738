"""Corruption fuzzing: decoders must reject or produce garbage — never
crash, hang, or read out of bounds."""
import numpy as np
import pytest

from brotlig_tpu import native
from brotlig_tpu.format.errors import BrotligError
from brotlig_tpu.refimpl.codec import decode as py_decode, encode

from test_roundtrip import make_data


@pytest.fixture(scope="module")
def blob():
    return encode(make_data("text", 100_000, seed=42), page_size=32768)


def corruptions(blob, rng, n):
    out = []
    for _ in range(n):
        b = bytearray(blob)
        kind = rng.integers(0, 4)
        if kind == 0:      # flip random byte
            b[rng.integers(0, len(b))] ^= int(rng.integers(1, 256))
        elif kind == 1:    # truncate
            b = b[: rng.integers(8, len(b))]
        elif kind == 2:    # corrupt page table region
            i = int(rng.integers(8, min(40, len(b))))
            b[i] ^= 0xFF
        else:              # burst of noise in payload
            i = int(rng.integers(50, len(b) - 16))
            for j in range(16):
                b[i + j] = int(rng.integers(0, 256))
        out.append(bytes(b))
    return out


class TestFuzz:
    def test_python_oracle_never_crashes(self, blob):
        rng = np.random.default_rng(0)
        for c in corruptions(blob, rng, 60):
            try:
                py_decode(c)
            except (BrotligError, ValueError):
                pass

    @pytest.mark.skipif(not native.available(), reason="no toolchain")
    def test_native_never_crashes(self, blob):
        rng = np.random.default_rng(1)
        for c in corruptions(blob, rng, 400):
            try:
                native.decode(c)
            except (ValueError, NotImplementedError):
                pass

    def test_tpu_never_crashes(self, blob):
        from brotlig_tpu.ops.decode import decode_stream_jax
        rng = np.random.default_rng(2)
        # fewer cases: each call is a device dispatch
        for c in corruptions(blob, rng, 8):
            try:
                decode_stream_jax(c)
            except (BrotligError, ValueError, IndexError):
                pass


class TestPageTableValidation:
    """decode_stream_jax must reject out-of-bounds page tables with a typed
    CorruptStream, like the native decoder (brotlig_core.cpp:436-439)."""

    def test_tpu_rejects_bad_table(self, blob):
        from brotlig_tpu.format.errors import CorruptStream
        from brotlig_tpu.ops.decode import decode_stream_jax
        # entry 1 is page 1's offset: point it far past the payload
        b = bytearray(blob)
        b[12:16] = (2 ** 31 - 1).to_bytes(4, "little")
        with pytest.raises(CorruptStream):
            decode_stream_jax(bytes(b))

    def test_tpu_rejects_truncated_table(self, blob):
        from brotlig_tpu.format.errors import CorruptStream
        from brotlig_tpu.ops.decode import decode_stream_jax
        with pytest.raises(CorruptStream):
            decode_stream_jax(blob[:10])

    def test_tpu_rejects_truncated_header(self):
        from brotlig_tpu.format.errors import CorruptStream
        from brotlig_tpu.ops.decode import decode_stream_jax
        with pytest.raises(CorruptStream):
            decode_stream_jax(b"\x05\xfa\x01")

    @pytest.mark.skipif(not native.available(), reason="no toolchain")
    def test_native_bounded_insert_dos(self):
        """A page declaring huge inserts must be rejected before the literal
        fill loop allocates (round-1 ADVICE item 1): decode of random noise
        pages completes quickly and raises, never ballooning memory."""
        rng = np.random.default_rng(7)
        for _ in range(50):
            page = rng.integers(0, 256, 200, dtype=np.uint8).tobytes()
            try:
                native.decode_page(page, 131072)
            except ValueError:
                pass
