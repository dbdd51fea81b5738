"""Brotli-G TPU benchmark (driver-facing).

Prints ONE JSON line. Headline metric is batched page-decode throughput
(uncompressed GB/s) on the default jax device over a mixed corpus; the same
line carries `encode_gbps` (full-device encode) and `ratio` (device encode
compression ratio) as auxiliary fields.

`vs_baseline` divides by the MEASURED single-thread CPU decode throughput
of this repo's native C++ decoder on this host (0.160 GB/s, BASELINE.md) —
the stand-in for the reference CPU decoder, which publishes no numbers and
cannot build here (unvendored brotli dependency).

Timing forces completion by fetching the output to host (np.asarray), not
block_until_ready, which on the axon backend can return early (PERF.md).
"""
import json
import os
import pickle
import signal
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# Hard watchdog: if the tunneled-TPU relay is down, backend INIT blocks
# forever inside C code where no Python timeout can fire; SIGALRM's
# default action terminates the process even there. Generous budget:
# corpus build + several multi-minute tunnel compiles.
signal.alarm(int(os.environ.get("BENCH_WATCHDOG_S", "5400")))

import numpy as np

from brotlig_tpu.utils import jaxcache
jaxcache.enable()

# Measured on this host (4-core) with the native C++ decoder
# (brotlig_tpu/native), single thread, 4 MiB mixed corpus — the stand-in for
# the reference CPU decoder's throughput (see BASELINE.md).
BASELINE_CPU_DECODE_GBPS = 0.160
PAGE_SIZE = 64 * 1024
CACHE = "/tmp/brotlig_bench_pages_v4.pkl"   # v4: real files + synthetic


def _real_bytes(min_len: int) -> bytes:
    """Concatenate real on-disk files (source code, docs, ELF binaries)
    into a Silesia-style mixed blob (BASELINE config 2's corpus class)."""
    import glob
    picks = (sorted(glob.glob("/root/repo/brotlig_tpu/**/*.py",
                              recursive=True))
             + sorted(glob.glob("/root/repo/brotlig_tpu/native/*.cpp"))
             + ["/root/repo/SURVEY.md", "/root/repo/PERF.md"]
             + sorted(glob.glob("/usr/bin/*"))[:40]
             + sorted(glob.glob("/usr/lib/x86_64-linux-gnu/*.so*"))[:40])
    buf = bytearray()
    for f in picks:
        try:
            with open(f, "rb") as fh:
                buf += fh.read(2 << 20)
        except OSError:
            continue
        if len(buf) >= min_len:
            break
    if not buf:
        buf = bytearray(b"fallback " * 8)
    while len(buf) < min_len:          # deterministic padding if short
        buf += buf[: min_len - len(buf)]
    return bytes(buf)


def make_corpus_pages(n_pages: int):
    """Mixed corpus: half real files (code + ELF binaries + docs), half
    synthetic text/structured/repetitive pages."""
    words = [b"the ", b"of ", b"and ", b"compression ", b"stream ",
             b"page ", b"huffman ", b"entropy ", b"decode ", b"brotli "]
    real = _real_bytes(((n_pages + 1) // 2) * PAGE_SIZE)
    nextreal = 0
    pages = []
    for i in range(n_pages):
        r = np.random.default_rng(i)
        kind = i % 6
        if kind in (0, 2, 4):          # real-file pages (half the corpus)
            pages.append(real[nextreal * PAGE_SIZE:
                              (nextreal + 1) * PAGE_SIZE])
            nextreal += 1
        elif kind == 1:  # text
            buf = bytearray()
            while len(buf) < PAGE_SIZE:
                buf += words[int(r.integers(0, len(words)))]
            pages.append(bytes(buf[:PAGE_SIZE]))
        elif kind == 3:  # structured binary
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
    pages = make_corpus_pages(n_pages)
    comps = []
    kept = []
    filler = make_corpus_pages(2)[1]    # compressible text page
    for p in pages:
        c = _encode_one(p)
        if c is None:                   # incompressible real page: blend
            p = p[: PAGE_SIZE // 2] + filler[: PAGE_SIZE // 2]
            c = _encode_one(p)
        if c is None:
            p, c = filler, _encode_one(filler)
        kept.append(p)
        comps.append(c)
    pages = kept
    with open(CACHE, "wb") as f:
        pickle.dump((pages, comps), f)
    return pages, comps


def _encode_one(page: bytes):
    """Compress one page to a bare page blob (native q11 encoder; the
    single-page container is header(8) + table(4) + payload). Returns
    None when the page would be stored raw (the decode-kernel bench only
    times compressed pages; the stream path memcpys raw ones)."""
    try:
        from brotlig_tpu import native
        blob = native.encode(page, page_size=PAGE_SIZE)
        comp = blob[12:]
        return comp if len(comp) < len(page) else None
    except Exception:
        from brotlig_tpu.refimpl.page_encoder import encode_page
        return encode_page(page, is_last=True)


def main():
    import jax
    import jax.numpy as jnp
    from brotlig_tpu.ops.decode import decode_pages, max_cmds_for

    n_pages = int(os.environ.get("BENCH_PAGES", "256"))
    reps = int(os.environ.get("BENCH_REPS", "5"))
    pages, comps = encoded_batch(n_pages)

    # sort pages by compressed size: kernel blocks then hold
    # similar-progress pages (tight command windows in the Pallas sweep)
    order = sorted(range(n_pages), key=lambda i: len(comps[i]))
    pages = [pages[i] for i in order]
    comps = [comps[i] for i in order]

    W = PAGE_SIZE // 4 + 2
    arr = np.zeros((n_pages, W * 4), dtype=np.uint8)
    sizes = np.zeros(n_pages, dtype=np.int32)
    for i, c in enumerate(comps):
        arr[i, : len(c)] = np.frombuffer(c, dtype=np.uint8)
        sizes[i] = len(c)
    words = jnp.asarray(arr.view(np.uint32).reshape(n_pages, W))
    sizes_j = jnp.asarray(sizes)
    mc = max_cmds_for(PAGE_SIZE)
    w_hint = (int(sizes.max()) + 3) // 4
    from brotlig_tpu.ops.pallas_decode import stream_words_hint
    s_hint = stream_words_hint(comps)   # routes to the Pallas kernels

    # warmup + validation ladder. Kernel variant/sweep width are EXPLICIT
    # arguments now (BLG_* env is resolved once here at the bench edge,
    # round-2 VERDICT weak item 6); the ladder steps down fused -> two-
    # phase -> xla and wide -> narrow on compile failure or byte
    # disagreement, so a Mosaic regression degrades the bench instead of
    # aborting it.
    from brotlig_tpu.ops.decode import (decode_pages_finish,
                                        decode_pages_start_staged,
                                        env_decode_opts)
    variant, sweep_cw = env_decode_opts()

    # Host-native staging (C++ parse + interleave, round-4): buf3 is
    # staged and uploaded ONCE, then the timed region covers the device
    # kernels + fetch — the same device-resident protocol as rounds 1-3
    # (and the reference's timestamp-query timing around the dispatch,
    # BrotligGPUDecoder.cpp:729-739; this host's tunnel uploads at
    # ~6 MB/s, ~1 ms on a real chip, so including it would only measure
    # the tunnel).
    use_staged = False
    try:
        from brotlig_tpu import native as _native
        use_staged = (_native.available()
                      and os.environ.get("BENCH_STAGED", "1") != "0")
    except Exception:
        pass
    buf3_j = npd_j = None
    if use_staged:
        payload = b"".join(comps)
        offs_np = np.cumsum([0] + [len(c) for c in comps[:-1]]).astype(
            np.uint64)
        szs_np = np.array([len(c) for c in comps], np.uint64)
        from brotlig_tpu.ops.pallas_decode import wl_bucket
        buf3_np, npd_np = _native.stage_pages(payload, offs_np, szs_np,
                                              wl_bucket(s_hint))
        buf3_j = jnp.asarray(buf3_np)
        npd_j = jnp.asarray(npd_np)

    def run_dev(v, cw):
        if v != "xla" and use_staged:
            st = decode_pages_start_staged(
                buf3_j, npd_j, PAGE_SIZE, mc,
                lambda: (words, sizes_j, w_hint), v, cw)
            out, _ = decode_pages_finish(st, PAGE_SIZE, mc)
            return out
        out, _ = decode_pages(words, sizes_j, PAGE_SIZE, mc, w_hint,
                              s_hint, v, cw)
        return out

    def run(v, cw):
        return np.asarray(run_dev(v, cw))

    ladder = [(variant, sweep_cw)]
    if (variant, sweep_cw) == ("fused", 1024):     # default: full ladder
        ladder += [("fused", 512), ("two_phase", 512), ("two_phase", 128),
                   ("xla", 512)]
    elif variant != "xla":
        ladder += [("xla", 512)]
    out_np = None
    for v, cw in ladder:
        try:
            out_np = run(v, cw)
            variant, sweep_cw = v, cw
            break
        except Exception:
            continue
    if out_np is None:                              # every rung failed
        out_np = run(variant, sweep_cw)             # surface the error
    for i in range(min(4, n_pages)):
        assert out_np[i].tobytes() == pages[i], f"bench page {i} mismatch"

    # Byte cross-check against an independent kernel formulation (cheap
    # hardware self-check); on disagreement step down to the alternative.
    if variant != "xla" and os.environ.get("BENCH_CROSSCHECK", "1") != "0":
        alt = ("two_phase", 128) if (variant, sweep_cw) != \
            ("two_phase", 128) else ("xla", 512)
        try:
            out_alt = run(*alt)
            if not np.array_equal(out_alt, out_np):
                variant, sweep_cw = alt
                out_np = out_alt
        except Exception:
            pass

    # Timing forces completion by fetching a reduction of the on-device
    # output (the reference GPU bench likewise times the dispatch via
    # timestamp queries, excluding readback: BrotligGPUDecoder.cpp:729-739)
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = run_dev(variant, sweep_cw)
        int(jnp.sum(out.astype(jnp.uint32)))
        times.append(time.perf_counter() - t0)
    dt = min(times)
    gbps = n_pages * PAGE_SIZE / dt / 1e9

    enc_gbps, ratio_q1, ratio_q11 = encode_bench(pages)
    pc_gbps = precond_bench(variant, sweep_cw)
    print(json.dumps({
        "metric": "decode_throughput",
        "value": round(gbps, 4),
        "unit": "GB/s",
        "vs_baseline": round(gbps / BASELINE_CPU_DECODE_GBPS, 4),
        "encode_gbps_q1": round(enc_gbps, 5),
        "encode_ratio_q1": round(ratio_q1, 3),
        "encode_ratio_q11": round(ratio_q11, 3),
        "precond_gbps": round(pc_gbps, 4),
        "variant": variant,
        "sweep_cw": sweep_cw,
        "staged": bool(use_staged),
    }))


# Version key: a stale cached blob from an older container format would
# fail the roundtrip check; regenerate instead of aborting (ADVICE r3).
PRECOND_CACHE = "/tmp/brotlig_bench_bc1_v2.pkl"


def precond_bench(variant, sweep_cw):
    """BASELINE config 3: BC1 texture decode incl. deconditioning.

    A synthetic 2048x2048 BC1 texture (structured block patterns so the
    sub-streams compress) is encoded once with precondition+swizzle+delta
    (cached); the timed region is the full stream decode INCLUDING the
    fused device deconditioning (delta decode + inverse gather). Runs the
    kernel rung the validation ladder proved (variant/sweep_cw plumbed
    through api.decode — ADVICE r3 medium); any failure degrades to 0.0
    instead of killing the whole bench."""
    if os.environ.get("BENCH_PRECOND", "1") == "0":
        return 0.0
    try:
        return _precond_bench(variant, sweep_cw)
    except Exception as e:
        print(f"precond bench failed: {e!r}", file=sys.stderr)
        return 0.0


def _make_bc1(w, h):
    r = np.random.default_rng(7)
    nblocks = (w // 4) * (h // 4)
    # BC1 block = 2x u16 endpoint colors + 4B indices; correlated
    # endpoints and low-entropy index planes like real textures
    c0 = (r.integers(0, 64, nblocks) * 1024 +
          np.arange(nblocks) % 1024).astype("<u2")
    c1 = (c0.astype(np.uint32) * 3 // 4).astype("<u2")
    idx = r.integers(0, 4, (nblocks, 4)).astype(np.uint8)
    idx = np.repeat(idx, 1, axis=1) * 0x55        # 2-bit rows repeated
    blocks = np.zeros((nblocks, 8), np.uint8)
    blocks[:, 0:2] = c0.view(np.uint8).reshape(-1, 2)
    blocks[:, 2:4] = c1.view(np.uint8).reshape(-1, 2)
    blocks[:, 4:8] = idx
    return blocks.tobytes()


def _precond_bench(variant, sweep_cw):
    from brotlig_tpu.api import decode as blg_decode, encode as blg_encode
    from brotlig_tpu.format.precondition import DataConditionParams
    from brotlig_tpu.format import constants as FC

    w = h = int(os.environ.get("BENCH_TEX_DIM", "2048"))
    params = DataConditionParams(
        precondition=True, swizzle=True, delta_encode=True,
        format=FC.DATA_FORMAT_BC1, width_in_pixels=w, height_in_pixels=h,
        num_mip_levels=1)
    reps = int(os.environ.get("BENCH_PRECOND_REPS", "3"))
    tex = blob = None
    if os.path.exists(PRECOND_CACHE):
        with open(PRECOND_CACHE, "rb") as f:
            tex, blob = pickle.load(f)
    if tex is not None:
        try:
            ok = blg_decode(blob, variant=variant,
                            sweep_cw=sweep_cw) == tex
        except Exception:
            ok = False
        if not ok:
            tex = blob = None            # stale cache: regenerate
    if tex is None:
        tex = _make_bc1(w, h)
        blob = blg_encode(tex, page_size=PAGE_SIZE, dc_params=params,
                          backend="tpu")   # device condition+delta+match
        with open(PRECOND_CACHE, "wb") as f:
            pickle.dump((tex, blob), f)

    out = blg_decode(blob, variant=variant, sweep_cw=sweep_cw)  # warm
    assert out == tex, "precond bench roundtrip mismatch"
    # timed region keeps the deconditioned result device-resident
    # (forced by a fetched reduction), same protocol as the decode metric
    from brotlig_tpu.ops.decode import decode_stream_jax
    import jax.numpy as jnp
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        res = decode_stream_jax(blob, variant=variant, sweep_cw=sweep_cw,
                                return_device=True)
        int(jnp.sum(res.astype(jnp.uint32)))
        times.append(time.perf_counter() - t0)
    return len(tex) / min(times) / 1e9


def encode_bench(pages):
    """Device encode: q1 tier throughput + ratio (timed), q11 DP tier
    ratio (untimed, smaller subset) — both tiers reported so the JSON
    no longer understates the q11 encoder (VERDICT r3 missing item 6).
    Each tier degrades to 0.0 on failure instead of killing the bench."""
    try:
        gbps, ratio_q1 = _encode_tier(pages, 1,
                                      int(os.environ.get(
                                          "BENCH_ENC_PAGES", "32")),
                                      int(os.environ.get(
                                          "BENCH_ENC_REPS", "2")))
    except Exception as e:
        print(f"encode q1 bench failed: {e!r}", file=sys.stderr)
        gbps, ratio_q1 = 0.0, 0.0
    try:
        _, ratio_q11 = _encode_tier(pages, 11,
                                    int(os.environ.get(
                                        "BENCH_ENC_Q11_PAGES", "8")), 1)
    except Exception as e:
        print(f"encode q11 bench failed: {e!r}", file=sys.stderr)
        ratio_q11 = 0.0
    return gbps, ratio_q1, ratio_q11


def _encode_tier(pages, q, n, reps):
    """Full-device encode throughput + ratio on a subset of the corpus."""
    from brotlig_tpu.ops.encode_pack import encode_pages_device

    # stride across the (size-sorted) corpus for a representative mix
    stride = max(1, len(pages) // n)
    sub = pages[::stride][:n]
    arr = np.zeros((len(sub), PAGE_SIZE), dtype=np.uint8)
    for i, p in enumerate(sub):
        arr[i] = np.frombuffer(p, np.uint8)
    sizes = np.full(len(sub), PAGE_SIZE, dtype=np.int32)
    isdelta = np.zeros(len(sub), dtype=np.int32)

    blobs = encode_pages_device(arr, sizes, PAGE_SIZE, isdelta, arr,
                                quality=q)                        # warm
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        blobs = encode_pages_device(arr, sizes, PAGE_SIZE, isdelta, arr,
                                    quality=q)
        times.append(time.perf_counter() - t0)
    dt = min(times)
    total_in = len(sub) * PAGE_SIZE
    total_out = sum(len(b) for b in blobs)
    return total_in / dt / 1e9, total_in / max(total_out, 1)


if __name__ == "__main__":
    main()
