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
