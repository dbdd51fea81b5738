"""Real-file corpus (Silesia-like mix: source text, ELF, JSON, base64)."""
import json
import os
import zlib

import pytest

from brotlig_tpu import native
from brotlig_tpu.refimpl.codec import decode as py_decode

CANDIDATES = [
    "/opt/venv/lib/python3.12/site-packages/jax/_src/numpy/lax_numpy.py",
    "/usr/bin/bash",
    "/etc/ssl/certs/ca-certificates.crt",
]

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="needs native codec")


def corpus():
    out = []
    for path in CANDIDATES:
        if os.path.exists(path):
            data = open(path, "rb").read()[:300_000]
            if len(data) > 1000:
                out.append((os.path.basename(path), data))
    j = {"k": [{"a": i, "b": "x" * 10, "c": i * 0.5} for i in range(3000)]}
    out.append(("json", json.dumps(j).encode()))
    return out


class TestRealCorpus:
    def test_roundtrips_and_competitive_ratio(self):
        tot_in = tot_q11 = tot_z = 0
        for name, data in corpus():
            blob = native.encode(data, quality=11)
            assert native.decode(blob) == data, name
            assert py_decode(blob) == data, name
            tot_in += len(data)
            tot_q11 += len(blob)
            tot_z += len(zlib.compress(data, 9))
        # q11 with 64KB page independence should stay within 10% of a
        # continuous-window zlib-9 on this mix (it beat it when written)
        assert tot_in / tot_q11 > 0.9 * (tot_in / tot_z)

    def test_tpu_decodes_real_files(self):
        from brotlig_tpu.ops.decode import decode_stream_jax
        name, data = corpus()[0]
        blob = native.encode(data)
        assert decode_stream_jax(blob) == data
