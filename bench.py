"""Brotli-G TPU decode benchmark (driver-facing).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Measures batched page-decode throughput (uncompressed GB/s) on the default
jax device over a Silesia-like mixed corpus of synthetic pages. Baseline is
the reference CPU decoder's single-thread throughput; the reference
publishes no numbers (BASELINE.md), so we use 1.0 GB/s as the recorded
stand-in until the native C++ oracle lands to measure it on this host.
"""
import json
import os
import pickle
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

from brotlig_tpu.utils import jaxcache
jaxcache.enable()

# Measured on this host (4-core) with the native C++ decoder
# (brotlig_tpu/native), single thread, 4 MiB mixed corpus — the stand-in for
# the reference CPU decoder's throughput (see BASELINE.md).
BASELINE_CPU_DECODE_GBPS = 0.160
PAGE_SIZE = 64 * 1024
CACHE = "/tmp/brotlig_bench_pages_v1.pkl"


def make_corpus_pages(n_pages: int):
    """Synthetic mixed corpus: text-like, structured, binary-ish pages."""
    words = [b"the ", b"of ", b"and ", b"compression ", b"stream ",
             b"page ", b"huffman ", b"entropy ", b"decode ", b"brotli "]
    pages = []
    for i in range(n_pages):
        r = np.random.default_rng(i)
        kind = i % 3
        if kind == 0:  # text
            buf = bytearray()
            while len(buf) < PAGE_SIZE:
                buf += words[int(r.integers(0, len(words)))]
            pages.append(bytes(buf[:PAGE_SIZE]))
        elif kind == 1:  # structured binary
            a = (r.integers(0, 16, PAGE_SIZE) +
                 (np.arange(PAGE_SIZE) // 256) % 64) % 256
            pages.append(a.astype(np.uint8).tobytes())
        else:  # repetitive
            pat = r.integers(0, 256, 173, dtype=np.uint8).tobytes()
            pages.append((pat * (PAGE_SIZE // len(pat) + 1))[:PAGE_SIZE])
    return pages


def encoded_batch(n_pages: int):
    if os.path.exists(CACHE):
        with open(CACHE, "rb") as f:
            pages, comps = pickle.load(f)
        if len(pages) >= n_pages:
            return pages[:n_pages], comps[:n_pages]
    from brotlig_tpu.refimpl.page_encoder import encode_page
    pages = make_corpus_pages(n_pages)
    comps = []
    for p in pages:
        c = encode_page(p, is_last=True)
        assert c is not None
        comps.append(c)
    with open(CACHE, "wb") as f:
        pickle.dump((pages, comps), f)
    return pages, comps


def main():
    import jax
    import jax.numpy as jnp
    from brotlig_tpu.ops.decode import decode_pages, max_cmds_for

    n_pages = int(os.environ.get("BENCH_PAGES", "64"))
    reps = int(os.environ.get("BENCH_REPS", "5"))
    pages, comps = encoded_batch(n_pages)

    W = PAGE_SIZE // 4 + 2
    arr = np.zeros((n_pages, W * 4), dtype=np.uint8)
    sizes = np.zeros(n_pages, dtype=np.int32)
    for i, c in enumerate(comps):
        arr[i, : len(c)] = np.frombuffer(c, dtype=np.uint8)
        sizes[i] = len(c)
    words = jnp.asarray(arr.view(np.uint32).reshape(n_pages, W))
    sizes_j = jnp.asarray(sizes)
    mc = max_cmds_for(PAGE_SIZE)

    # warmup + correctness check
    out, _ = decode_pages(words, sizes_j, PAGE_SIZE, mc)
    out.block_until_ready()
    out_np = np.asarray(out)
    for i in range(min(4, n_pages)):
        assert out_np[i].tobytes() == pages[i], f"bench page {i} mismatch"

    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out, _ = decode_pages(words, sizes_j, PAGE_SIZE, mc)
        out.block_until_ready()
        times.append(time.perf_counter() - t0)
    dt = min(times)
    gbps = n_pages * PAGE_SIZE / dt / 1e9
    print(json.dumps({
        "metric": "decode_throughput",
        "value": round(gbps, 4),
        "unit": "GB/s",
        "vs_baseline": round(gbps / BASELINE_CPU_DECODE_GBPS, 4),
    }))


if __name__ == "__main__":
    main()
