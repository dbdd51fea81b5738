"""Stage-level profile of the device decode path (PERF.md decode section).

Times, on the default jax device over the bench corpus (compressed pages,
size-sorted like bench.py):

  prologue  — XLA header/size-table parse + stream interleave + 3 Huffman
              table loads (pallas_decode._prologue): everything that runs
              OUTSIDE the kernel in the fused variant
  interleave— the interleave alone (the unavoidable O(bytes) data pass)
  fused     — decode_pages variant="fused" end to end
  two_phase — decode_pages variant="two_phase" end to end
  xla       — decode_pages variant="xla" end to end

Completion is forced by fetching a reduction of each stage's on-device
output. Only within-window relative numbers are meaningful on this host
(PERF.md: absolute window speed varies up to 25x); run back-to-back and
compare shares.

Usage: [BENCH_PAGES=256] [PROF_REPS=3] python tools/profile_decode.py
"""
import json
import os
import signal
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
signal.alarm(int(os.environ.get("BENCH_WATCHDOG_S", "5400")))

import numpy as np

from brotlig_tpu.utils import jaxcache

jaxcache.enable()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from bench import PAGE_SIZE, encoded_batch  # noqa: E402
from brotlig_tpu.ops.decode import decode_pages, max_cmds_for  # noqa: E402
from brotlig_tpu.ops import pallas_decode as PD  # noqa: E402


@jax.jit
def _tree_sum(tree):
    tot = jnp.uint32(0)
    for leaf in jax.tree_util.tree_leaves(tree):
        tot = tot + jnp.sum(jnp.asarray(leaf).astype(jnp.uint32))
    return tot


def fetch(tree):
    """ONE device reduction + ONE host fetch for the whole tree (a
    per-leaf fetch costs a ~30ms tunnel roundtrip each on this host and
    swamps the stage being timed)."""
    return int(np.asarray(_tree_sum(tree)))


def timeit(label, fn, reps):
    fn()
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    best = min(ts)
    print(json.dumps({"stage": label, "ms": round(best * 1e3, 2),
                      "all_ms": [round(t * 1e3, 1) for t in ts]}),
          flush=True)
    return best


def assert_plane_scatter_donates():
    """The fused-decondition drain must update the resident output plane
    IN PLACE (donated scatter): without donation every batch drain copies
    the whole [num_pages, page_size] plane — O(batches x plane) HBM
    traffic on multi-GB preconditioned bundles (VERDICT r4 weak 8). On
    TPU a donated input buffer is invalidated, which this asserts; CPU
    ignores donation, so the check is skipped there."""
    from brotlig_tpu.ops.decode import _plane_scatter
    plane = jnp.zeros((256, PAGE_SIZE), jnp.uint8)
    rows = jnp.arange(4, dtype=jnp.int32)
    pages16 = jnp.ones((4, PAGE_SIZE), jnp.uint8)
    out = _plane_scatter(plane, rows, pages16)
    out.block_until_ready()
    if jax.devices()[0].platform in ("tpu", "axon"):
        assert plane.is_deleted(), \
            "plane scatter did not donate: drain copies the whole plane"
    print(json.dumps({"stage": "plane_scatter_donated", "ok": True}))


def main():
    n_pages = int(os.environ.get("BENCH_PAGES", "256"))
    reps = int(os.environ.get("PROF_REPS", "3"))
    assert_plane_scatter_donates()
    pages, comps = encoded_batch(n_pages)
    order = sorted(range(n_pages), key=lambda i: len(comps[i]))
    pages = [pages[i] for i in order]
    comps = [comps[i] for i in order]
    total = n_pages * PAGE_SIZE

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
    s_hint = PD.stream_words_hint(comps)
    wl = PD.wl_bucket(s_hint)

    # round-4 pipeline stages: XLA interleave (legacy words path),
    # on-chip tables kernel + XLA search-build, host-native staging
    interleave = jax.jit(
        lambda w, s: PD._parse_and_interleave(w, s, wl)[0])
    t_il = timeit("interleave_xla",
                  lambda: fetch(interleave(words, sizes_j)), reps)
    buf3 = interleave(words, sizes_j)

    tables = jax.jit(lambda b: PD._tables_from_buf(b, False))
    t_tab = timeit("tables", lambda: fetch(tables(buf3)), reps)

    from brotlig_tpu import native
    payload = b"".join(comps)
    offs_np = np.cumsum([0] + [len(c) for c in comps[:-1]]).astype(
        np.uint64)
    szs_np = np.array([len(c) for c in comps], np.uint64)
    t_host = t_up = float("inf")
    if native.available():
        def host_stage():
            return native.stage_pages(payload, offs_np, szs_np, wl)
        host_stage()
        t0 = time.perf_counter()
        for _ in range(reps):
            b3, npd = host_stage()
        t_host = (time.perf_counter() - t0) / reps

        def upload():
            return fetch((jnp.asarray(b3), jnp.asarray(npd)))
        t_up = timeit("upload", upload, reps)

    # two-phase split: phase A kernel alone (start), then the full pair
    wl_b = PD.wl_bucket(s_hint)
    t_pa = timeit("phase_a_kernel", lambda: fetch(PD.phase_a_pallas(
        words, sizes_j, PAGE_SIZE, mc, wl_b, False)), reps)

    res = {"phase_a": t_pa}
    for variant in ("fused", "two_phase", "xla"):
        t = timeit(variant, lambda v=variant: fetch(decode_pages(
            words, sizes_j, PAGE_SIZE, mc, w_hint, s_hint, v, 512)[0]),
            reps)
        res[variant] = t

    # staged end-to-end: host stage + upload + fused kernel + fetch
    if native.available():
        from brotlig_tpu.ops.decode import (decode_pages_finish,
                                            decode_pages_start_staged)

        def staged():
            b3, npd = host_stage()
            st = decode_pages_start_staged(
                jnp.asarray(b3), jnp.asarray(npd), PAGE_SIZE, mc,
                lambda: (words, sizes_j, w_hint), "fused", 512)
            return fetch(decode_pages_finish(st, PAGE_SIZE, mc)[0])
        res["fused_staged"] = timeit("fused_staged", staged, reps)

    base = res.get("fused_staged", res["fused"])
    print(json.dumps({
        "pages": n_pages, "bytes": total,
        "fused_gbps": round(total / res["fused"] / 1e9, 5),
        "staged_gbps": round(total / base / 1e9, 5),
        "host_stage_s": round(t_host, 4),
        "shares_of_staged": {
            "host_stage": round(t_host / base, 3),
            "upload": round(t_up / base, 3),
            "tables": round(t_tab / base, 3),
            "interleave_xla_would_be": round(t_il / base, 3),
            "phase_a": round(res["phase_a"] / base, 3)},
        "two_phase_over_fused": round(res["two_phase"] / res["fused"], 3),
        "xla_over_fused": round(res["xla"] / res["fused"], 3),
    }), flush=True)


if __name__ == "__main__":
    main()
