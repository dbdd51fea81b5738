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

    # Adaptive fused-kernel command bucket: the warmup pass observes the
    # corpus's real command peak (notes["peak_cmds"]) and the timed runs
    # use a bucket sized to it — smaller command planes fit more pages
    # per kernel block, dividing the lockstep iteration count. The stats
    # overflow check inside decode_pages_finish keeps any undershoot
    # correct (rerun at full bounds).
    mc_state = {"hint": None}

    def run_dev(v, cw, notes=None):
        if v != "xla" and use_staged:
            st = decode_pages_start_staged(
                buf3_j, npd_j, PAGE_SIZE, mc,
                lambda: (words, sizes_j, w_hint), v, cw,
                mc_state["hint"], notes)
            out, _ = decode_pages_finish(st, PAGE_SIZE, mc)
            return out
        out, _ = decode_pages(words, sizes_j, PAGE_SIZE, mc, w_hint,
                              s_hint, v, cw, mc_state["hint"], notes)
        return out

    def run(v, cw):
        notes = {}
        out = np.asarray(run_dev(v, cw, notes))
        if notes.get("peak_cmds") and not notes.get("overflow"):
            peak = notes["peak_cmds"]
            ch = notes.get("peak_chunks", 0)
            mc_state["hint"] = (peak + peak // 8 + 32, ch + ch // 8 + 4)
        return out

    ladder = [(variant, sweep_cw)]
    if (variant, sweep_cw) == ("fused", 2048):     # default: full ladder
        ladder += [("fused", 1024), ("fused", 512), ("two_phase", 512),
                   ("two_phase", 128), ("xla", 512)]
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
    # full-batch ground-truth validation (VERDICT r4 weak item 6: a
    # silent wrong-output regression on any page must fail the bench,
    # not post a throughput number)
    expect = np.frombuffer(b"".join(pages), np.uint8).reshape(
        n_pages, PAGE_SIZE)
    assert np.array_equal(out_np, expect), "bench batch mismatch vs truth"

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
    # timestamp queries, excluding readback: BrotligGPUDecoder.cpp:729-739).
    # On the staged fused route the timed reps call the kernel directly
    # with the warmup-verified buckets and defer the stats overflow gate
    # + byte validation to AFTER the loop (one extra tunnel roundtrip per
    # rep otherwise — a this-host artifact that real stream pipelines
    # overlap behind the next batch's phase A; the gate still runs, just
    # outside the clock, like the reference's post-readback checks).
    deferred = None
    if use_staged and variant == "fused" and mc_state["hint"]:
        from brotlig_tpu.ops.decode import _resolve_mc_bucket
        from brotlig_tpu.ops.pallas_decode import decode_fused_from_buf
        mcb, chb = _resolve_mc_bucket(PAGE_SIZE, mc, mc_state["hint"])
        npf, ndi, isd = npd_j[:, 0], npd_j[:, 1], npd_j[:, 2]

        def run_timed():
            return decode_fused_from_buf(buf3_j, npf, ndi, isd,
                                         PAGE_SIZE, mc, False, sweep_cw,
                                         mcb, chb)
        out_b, _isd, _nc, stats_d = run_timed()      # warm this shape
        times = []
        for _ in range(reps):
            t0 = time.perf_counter()
            out_b, _isd, _nc, stats_d = run_timed()
            int(jnp.sum(out_b.astype(jnp.uint32)))
            times.append(time.perf_counter() - t0)
        deferred = (out_b, stats_d, mcb, chb)
    else:
        times = []
        for _ in range(reps):
            t0 = time.perf_counter()
            out = run_dev(variant, sweep_cw)
            int(jnp.sum(out.astype(jnp.uint32)))
            times.append(time.perf_counter() - t0)
    dt = min(times)
    if deferred is not None:
        from brotlig_tpu.ops.pallas_decode import fused_bounds
        out_b, stats_d, mcb, chb = deferred
        stats_np = np.asarray(stats_d)
        mc_t, cap_t = fused_bounds(PAGE_SIZE, mc, mcb, chb)
        assert int(stats_np[:, 1].max()) < mc_t // 32 \
            and int(stats_np[:, 0].max()) < cap_t - 1, \
            "timed-rep bucket overflow: warmup hint was unsound"
        assert np.array_equal(np.asarray(out_b), expect), \
            "timed-rep output mismatch vs ground truth"
    gbps = n_pages * PAGE_SIZE / dt / 1e9

    # Host-staging honesty (VERDICT r4 missing item 3): the C++ parse +
    # interleave IS decode work the resident number excludes. Time it on
    # the same payload and report both the stage cost and a staged-
    # INCLUDED throughput (serial sum — no overlap credit taken, though
    # decode_stream_jax does overlap staging with device decode). The
    # device upload stays excluded on this host only because the tunnel
    # uploads at ~6 MB/s (~1 ms over PCIe on a real chip).
    stage_ms = 0.0
    if use_staged:
        payload = b"".join(comps)
        offs_np = np.cumsum([0] + [len(c) for c in comps[:-1]]).astype(
            np.uint64)
        szs_np = np.array([len(c) for c in comps], np.uint64)
        from brotlig_tpu import native as _native
        from brotlig_tpu.ops.pallas_decode import wl_bucket
        stimes = []
        for _ in range(max(reps, 3)):
            t0 = time.perf_counter()
            _native.stage_pages(payload, offs_np, szs_np,
                                wl_bucket(s_hint))
            stimes.append(time.perf_counter() - t0)
        stage_ms = min(stimes) * 1e3
    gbps_incl = n_pages * PAGE_SIZE / (dt + stage_ms / 1e3) / 1e9

    enc_gbps, ratio_q1, ratio_q11 = encode_bench(pages)
    pc_gbps = precond_bench(variant, sweep_cw)
    sil_gbps, sil_ratio = silesia_bench(variant, sweep_cw)
    print(json.dumps({
        "metric": "decode_throughput",
        "value": round(gbps, 4),
        "unit": "GB/s",
        "vs_baseline": round(gbps / BASELINE_CPU_DECODE_GBPS, 4),
        "gbps_incl_stage": round(gbps_incl, 4),
        "stage_ms": round(stage_ms, 2),
        "encode_gbps_q1": round(enc_gbps, 5),
        "encode_ratio_q1": round(ratio_q1, 3),
        "encode_ratio_q11": round(ratio_q11, 3),
        "precond_gbps": round(pc_gbps, 4),
        "silesia_gbps": round(sil_gbps, 4),
        "silesia_ratio": round(sil_ratio, 3),
        "variant": variant,
        "sweep_cw": sweep_cw,
        "staged": bool(use_staged),
    }))


# Version key: a stale cached blob from an older container format would
# fail the roundtrip check; regenerate instead of aborting (ADVICE r3).
# v3: 4096x8192 texture = 256 pages (VERDICT r4: the 32-page 2048^2 config
# measured small-batch amortization, not the decondition path).
PRECOND_CACHE = "/tmp/brotlig_bench_bc1_v3.pkl"
SILESIA_CACHE = "/tmp/brotlig_bench_silesia_v1.pkl"


def _silesia_corpus(n_files: int, flen: int):
    """Silesia-class stand-in corpus (BASELINE config 2): n distinct
    real files of mixed type — ELF executables, shared libraries, source
    code, prose/markdown, base64 certificates, binary tables — each
    exactly flen bytes (deterministic padding). The real Silesia corpus
    is not on this disk; this mirrors its mixed-type multi-file shape."""
    import glob
    groups = [
        sorted(glob.glob("/usr/bin/*"))[:64],
        sorted(glob.glob("/usr/lib/x86_64-linux-gnu/*.so*"))[:64],
        sorted(glob.glob("/root/repo/brotlig_tpu/**/*.py",
                         recursive=True)),
        ["/root/repo/SURVEY.md", "/root/repo/PERF.md",
         "/root/repo/BASELINE.md", "/root/repo/ARCHITECTURE.md"],
        ["/etc/ssl/certs/ca-certificates.crt"],
        sorted(glob.glob("/usr/share/zoneinfo/America/*"))[:200],
    ]
    files = []
    gi = 0
    while len(files) < n_files:
        grp = groups[gi % len(groups)] or ["/root/repo/SURVEY.md"]
        start = (gi // len(groups)) * 7 % max(len(grp), 1)
        buf = bytearray()
        for f in grp[start:] + grp[:start]:
            try:
                with open(f, "rb") as fh:
                    buf += fh.read(flen)
            except OSError:
                continue
            if len(buf) >= flen:
                break
        if not buf:
            buf = bytearray(b"silesia fallback corpus " * 64)
        while len(buf) < flen:
            buf += buf[: flen - len(buf)]
        files.append(bytes(buf[:flen]))
        gi += 1
    return files


def silesia_bench(variant, sweep_cw):
    """BASELINE config 2: multi-file mixed-type sweep. Encodes 16 x 1 MiB
    real files into 16 independent containers (native q11; cached),
    reports (pooled decode GB/s, corpus compression ratio). Pages from
    all archives share device batches — the multi-archive pooling path
    (parallel/runtime.py::decode_archives_batched's layout). Degrades to
    (0.0, 0.0) on failure instead of killing the bench."""
    if os.environ.get("BENCH_SILESIA", "1") == "0":
        return 0.0, 0.0
    try:
        return _silesia_bench(variant, sweep_cw)
    except Exception as e:
        print(f"silesia bench failed: {e!r}", file=sys.stderr)
        return 0.0, 0.0


def _silesia_bench(variant, sweep_cw):
    import jax.numpy as jnp
    from brotlig_tpu.format.headers import parse_container
    from brotlig_tpu.ops.decode import (decode_pages, max_cmds_for)
    from brotlig_tpu.ops.pallas_decode import stream_words_hint

    n_files = int(os.environ.get("BENCH_SILESIA_FILES", "16"))
    flen = 1 << 20
    reps = int(os.environ.get("BENCH_SILESIA_REPS", "3"))
    files = blobs = None
    if os.path.exists(SILESIA_CACHE):
        with open(SILESIA_CACHE, "rb") as f:
            files, blobs = pickle.load(f)
        if len(files) != n_files:
            files = blobs = None
    if files is not None:     # stale-format check on one container
        try:
            from brotlig_tpu import api as _api
            ok = _api.decode(blobs[0], backend="cpu") == files[0]
        except Exception:
            ok = False
        if not ok:
            files = blobs = None
    if files is None:
        from brotlig_tpu import native
        files = _silesia_corpus(n_files, flen)
        blobs = [native.encode(d, page_size=PAGE_SIZE) for d in files]
        with open(SILESIA_CACHE, "wb") as f:
            pickle.dump((files, blobs), f)
    ratio = sum(map(len, files)) / max(sum(map(len, blobs)), 1)

    # pool compressed pages across all archives (raw pages memcpy on the
    # stream path and are excluded from the timed device batch, same as
    # the headline metric)
    jobs = []   # (blob_idx, page_idx, off, size, truth)
    for bi, blob in enumerate(blobs):
        info = parse_container(blob)
        ps = info.header.page_size
        assert ps == PAGE_SIZE
        for i in info.compressed_page_indices():
            off, sz = int(info.offsets[i]), int(info.sizes[i])
            truth = files[bi][i * ps: i * ps + info.page_out_sizes[i]]
            jobs.append((bi, i, off, sz, truth))
    if not jobs:
        return 0.0, ratio
    jobs.sort(key=lambda j: j[3])
    P = len(jobs)
    W = PAGE_SIZE // 4 + 2
    arr = np.zeros((P, W * 4), np.uint8)
    sizes = np.zeros(P, np.int32)
    for r, (bi, _i, off, sz, _t) in enumerate(jobs):
        arr[r, :sz] = np.frombuffer(blobs[bi], np.uint8, sz, off)
        sizes[r] = sz
    words = jnp.asarray(arr.view(np.uint32).reshape(P, W))
    sizes_j = jnp.asarray(sizes)
    mc = max_cmds_for(PAGE_SIZE)
    w_hint = (int(sizes.max()) + 3) // 4
    s_hint = stream_words_hint(
        [(blobs[bi][off: off + 96], sz)
         for (bi, _i, off, sz, _t) in jobs])

    notes: dict = {}
    out_w, _ = decode_pages(words, sizes_j, PAGE_SIZE, mc, w_hint, s_hint,
                            variant, sweep_cw, None, notes)
    out_np = np.asarray(out_w)
    for r, (_bi, _i, _o, _s, truth) in enumerate(jobs):
        assert out_np[r, : len(truth)].tobytes() == truth, \
            f"silesia page {r} mismatch"
    hint = None
    if notes.get("peak_cmds") and not notes.get("overflow"):
        pc = notes["peak_cmds"]
        ch = notes.get("peak_chunks", 0)
        hint = (pc + pc // 8 + 32, ch + ch // 8 + 4)
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out_w, _ = decode_pages(words, sizes_j, PAGE_SIZE, mc, w_hint,
                                s_hint, variant, sweep_cw, hint)
        int(jnp.sum(out_w.astype(jnp.uint32)))
        times.append(time.perf_counter() - t0)
    return P * PAGE_SIZE / min(times) / 1e9, ratio


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

    # 4096x8192 BC1 = 16 MiB = 256 x 64 KiB pages: the timed region now
    # measures the decode+decondition path at full batch scale, not
    # small-batch amortization (VERDICT r4 weak item 7: the 2048^2 /
    # 32-page config's number was an artifact of batch size)
    w = int(os.environ.get("BENCH_TEX_DIM", "4096"))
    h = int(os.environ.get("BENCH_TEX_DIM_H", str(2 * w)))
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
