"""TPU bulk-greedy encoder: command validity and end-to-end roundtrips."""
import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from brotlig_tpu import native
from brotlig_tpu.ops.encode import encode_stream_tpu, find_commands
from brotlig_tpu.refimpl.codec import decode as py_decode

from test_roundtrip import make_data

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="needs native packer")


def cmds_for(data: bytes, S=32768):
    arr = np.zeros((1, S), np.uint8)
    arr[0, : len(data)] = np.frombuffer(data, np.uint8)
    sizes = np.array([len(data)], np.int32)
    ins, cpy, dist, nc = find_commands(jnp.asarray(arr), jnp.asarray(sizes),
                                       S // 2 + 2)
    k = int(nc[0])
    return (np.asarray(ins)[0, :k], np.asarray(cpy)[0, :k],
            np.asarray(dist)[0, :k])


class TestFindCommands:
    @pytest.mark.parametrize("kind", ["text", "zeros", "repetitive",
                                      "structured"])
    def test_commands_are_valid(self, kind):
        data = make_data(kind, 20000, seed=1)
        ins, cpy, dist = cmds_for(data)
        pos = 0
        for i, c, d in zip(ins, cpy, dist):
            pos += int(i)
            assert c >= 4
            assert 1 <= d <= pos, (pos, d)
            # the copy must reproduce the original bytes
            src = bytearray(data[:pos])
            for j in range(int(c)):
                src.append(src[pos - int(d) + j])
            assert bytes(src[pos: pos + int(c)]) == \
                data[pos: pos + int(c)], "match bytes differ"
            pos += int(c)
        assert pos <= len(data)

    def test_run_detection_uncapped(self):
        data = b"x" * 10000
        ins, cpy, dist = cmds_for(data)
        # one d=1 run command should cover nearly everything
        assert len(ins) == 1
        assert dist[0] == 1
        assert cpy[0] >= 9990

    def test_empty_and_tiny(self):
        for n in (0, 1, 3, 4, 5):
            data = make_data("text", n, seed=2)
            blob = encode_stream_tpu(data)
            assert py_decode(blob) == data


class TestStreamTpuEncode:
    @pytest.mark.parametrize("kind,n", [
        ("text", 150_000), ("repetitive", 100_000), ("zeros", 131072),
        ("structured", 100_000), ("random", 70_000),
    ])
    def test_roundtrip_both_decoders(self, kind, n):
        data = make_data(kind, n, seed=n + 3)
        blob = encode_stream_tpu(data)
        assert py_decode(blob) == data
        assert native.decode(blob) == data

    def test_tpu_decodes_tpu_encoded(self):
        from brotlig_tpu.ops.decode import decode_stream_jax
        data = make_data("text", 100_000, seed=9)
        assert decode_stream_jax(encode_stream_tpu(data)) == data

    def test_api_backend_tpu(self):
        import brotlig_tpu
        data = make_data("text", 80_000, seed=10)
        blob = brotlig_tpu.encode(data, backend="tpu")
        assert brotlig_tpu.decode(blob, backend="cpu") == data

    def test_ratio_not_catastrophic(self):
        data = make_data("text", 200_000, seed=11)
        tpu = len(encode_stream_tpu(data))
        cpu = len(native.encode(data))
        assert tpu <= cpu * 1.5, (tpu, cpu)


class TestRatioRegression:
    """Compression-ratio floors for the device paths (guards matcher and
    packer quality; values are ~5% below levels measured 2026-08-17, see
    PERF.md encoder ledger)."""

    def test_device_full_ratio_floors(self):
        from test_roundtrip import make_data
        from brotlig_tpu.ops.encode_pack import encode_stream_tpu_full
        floors = {"text": 4.3, "structured": 1.35, "repetitive": 200.0}
        for kind, floor in floors.items():
            d = make_data(kind, 128 * 1024, seed=11)
            blob = encode_stream_tpu_full(d, page_size=65536)
            ratio = len(d) / len(blob)
            assert ratio >= floor, f"{kind}: {ratio:.2f}x < {floor}x"

    def test_hybrid_ratio_floors(self):
        from test_roundtrip import make_data
        from brotlig_tpu.ops.encode import encode_stream_tpu
        from brotlig_tpu import native
        if not (native.available() and native.has_encoder()):
            import pytest
            pytest.skip("native packer unavailable")
        floors = {"text": 4.4, "repetitive": 500.0}
        for kind, floor in floors.items():
            d = make_data(kind, 128 * 1024, seed=11)
            blob = encode_stream_tpu(d, page_size=65536)
            ratio = len(d) / len(blob)
            assert ratio >= floor, f"{kind}: {ratio:.2f}x < {floor}x"
