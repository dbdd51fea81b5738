"""Pallas phase-A kernel vs the XLA phase A: full equality + end-to-end.

Runs the kernel in interpret mode on CPU (tests/conftest.py pins the
default device); on real TPU hardware the same code path compiles via
Mosaic (exercised by bench.py / BROTLIG_TEST_TPU runs).
"""
import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from brotlig_tpu.ops.decode import (_stage_symbols, decode_pages,
                                    max_cmds_for)
from brotlig_tpu.ops import pallas_decode as PD
from brotlig_tpu.refimpl.page_encoder import encode_page

from test_roundtrip import make_data
from test_ops_decode import batch


@pytest.fixture(scope="module")
def mixed_batch():
    n = 32768
    kinds = ["text", "repetitive", "structured", "zeros"]
    datas = [make_data(k, 3000, seed=i + 1) for i, k in enumerate(kinds)]
    comps = [encode_page(d, is_last=True) for d in datas]
    keep = [(c, d) for c, d in zip(comps, datas) if c is not None]
    words, sizes = batch([c for c, _ in keep], n)
    return n, keep, words, sizes


class TestPallasPhaseA:
    def test_matches_xla_phase_a(self, mixed_batch):
        n, keep, words, sizes = mixed_batch
        mc = max_cmds_for(n)
        (ncmds_x, litbuf_x, ins_x, cpy_x, dco_x, dex_x, npf_x, ndi_x,
         *_rest) = _stage_symbols(words, sizes, n, mc)
        ncmds_x = np.asarray(ncmds_x)

        wl = PD.wl_bucket(PD.stream_words_hint([c for c, _ in keep]))
        (ncmds_p, lit_t, chs, chc, cmd_t, _npf, _ndi, _isd,
         stats) = PD.phase_a_pallas(words, sizes, n, mc, wl, True)
        assert (np.asarray(ncmds_p) == ncmds_x).all()

        P = len(keep)
        R = mc // 32
        # kernel slot 2 holds ring-RESOLVED absolute distances; build the
        # expected values from the XLA code/extra arrays
        from brotlig_tpu.ops.decode import _resolve_distances
        cid = jnp.arange(ins_x.shape[1], dtype=jnp.int32)[None, :]
        valid = cid < jnp.asarray(ncmds_x)[:, None]
        ins_m = jnp.where(valid, ins_x, 0)
        cpy_m = jnp.where(valid, cpy_x, 0)
        dist_x = np.asarray(_resolve_distances(
            ins_m, cpy_m, dco_x, dex_x, jnp.asarray(ncmds_x),
            npf_x, ndi_x, ins_x.shape[1]))
        cpy_np = np.asarray(cpy_m)

        ins_p, cpy_p, dst_p, _ = [np.asarray(a) for a in
                                  PD.cmds_from_rounds(cmd_t, P, R)]
        for p in range(P):
            k = ncmds_x[p]
            assert (ins_p[p, :k] == np.asarray(ins_x)[p, :k]).all()
            assert (cpy_p[p, :k] == np.asarray(cpy_x)[p, :k]).all()
            sel = cpy_np[p, :k] > 0      # dist only matters on copies
            assert (dst_p[p, :k][sel] == dist_x[p, :k][sel]).all()

        litbuf_p = np.asarray(PD.finish_pallas(
            lit_t, chs, chc, n, chs.shape[0], n + 64))
        litbuf_x = np.asarray(litbuf_x)
        for p in range(P):
            nlit = int(np.asarray(ins_x)[p, : ncmds_x[p]].sum())
            assert (litbuf_p[p, :nlit] == litbuf_x[p, :nlit]).all()

    @pytest.mark.parametrize("cw", [128, 512, 1024])
    def test_end_to_end_decode_two_phase(self, mixed_batch, cw):
        """Two-phase pipeline (phase-A kernel + sweep kernel) with both
        sweep widths: 512 is the hardware-validated default, 128 the
        fallback bench.py trusts on disagreement."""
        n, keep, words, sizes = mixed_batch
        s_hint = PD.stream_words_hint([c for c, _ in keep])
        out, _isd = decode_pages(words, sizes, n, max_cmds_for(n),
                                 w_hint=None, s_hint=s_hint,
                                 variant="two_phase", sweep_cw=cw)
        out = np.asarray(out)
        for p, (_, d) in enumerate(keep):
            assert out[p, : len(d)].tobytes() == d

    @pytest.mark.parametrize("cw", [128, 512, 1024])
    def test_end_to_end_decode_fused(self, mixed_batch, cw):
        """The fused single-dispatch kernel (the default variant) must
        agree byte-for-byte, with both sweep widths."""
        n, keep, words, sizes = mixed_batch
        s_hint = PD.stream_words_hint([c for c, _ in keep])
        out, _isd = decode_pages(words, sizes, n, max_cmds_for(n),
                                 w_hint=None, s_hint=s_hint,
                                 variant="fused", sweep_cw=cw)
        out = np.asarray(out)
        for p, (_, d) in enumerate(keep):
            assert out[p, : len(d)].tobytes() == d


@pytest.mark.parametrize("cw", [512, 1024])
def test_full_page_wide_sweep(cw):
    """FULL pages (content spans the whole page) through the wide sweep:
    copy sources land in the upper output half, which the cw=1024 kernel
    once left forever pending in its copy-fetch loop (the out-row bound
    is S//512 independent of the group width — hardware kernel hang,
    round 4). Small-content pages never reach that region."""
    n = 32768
    datas = [make_data("text", n, seed=31), make_data("repetitive", n,
                                                      seed=32)]
    comps = [encode_page(d, is_last=True) for d in datas]
    keep = [(c, d) for c, d in zip(comps, datas) if c is not None]
    assert keep
    words, sizes = batch([c for c, _ in keep], n)
    s_hint = PD.stream_words_hint([c for c, _ in keep])
    out, _ = decode_pages(words, sizes, n, max_cmds_for(n),
                          w_hint=None, s_hint=s_hint,
                          variant="fused", sweep_cw=cw)
    out = np.asarray(out)
    for p, (_, d) in enumerate(keep):
        assert out[p, : len(d)].tobytes() == d


def test_fused_mc_hint_overflow_rerun():
    """An undershot mc_hint (VMEM bucket smaller than the page's real
    command count) must be detected via the kernel stats and rerun at
    full bounds — same bytes, notes flag set; a well-sized hint decodes
    without a rerun and reports the observed peaks (round-5 adaptive
    bucket machinery)."""
    n = 32768
    datas = [make_data("text", n, seed=77), make_data("text", n, seed=78)]
    comps = [encode_page(d, is_last=True) for d in datas]
    keep = [(c, d) for c, d in zip(comps, datas) if c is not None]
    assert keep
    words, sizes = batch([c for c, _ in keep], n)
    s_hint = PD.stream_words_hint([c for c, _ in keep])
    # a reduced command bound (still >= the pages' real counts) and the
    # narrow sweep kernel keep the three interpret-mode kernel variants
    # this test compiles small; the bucket/rerun machinery under test is
    # bound- and sweep-width-agnostic
    mc = 8192

    notes = {}
    # mc_hint=1 -> floor bucket (2048 commands): full text pages carry
    # thousands of commands, so this MUST overflow and rerun
    out, _ = decode_pages(words, sizes, n, mc,
                          w_hint=None, s_hint=s_hint, variant="fused",
                          sweep_cw=128, mc_hint=1, notes=notes)
    out = np.asarray(out)
    for p, (_, d) in enumerate(keep):
        assert out[p, : len(d)].tobytes() == d
    assert notes["overflow"]

    notes2 = {}
    pc, ch = notes["peak_cmds"], notes["peak_chunks"]
    out2, _ = decode_pages(words, sizes, n, mc,
                           w_hint=None, s_hint=s_hint, variant="fused",
                           sweep_cw=128,
                           mc_hint=(pc + pc // 4 + 32, ch + ch // 4 + 4),
                           notes=notes2)
    out2 = np.asarray(out2)
    assert np.array_equal(out, out2)
    assert not notes2["overflow"]


@pytest.mark.parametrize("cw", [2048])
def test_single_command_full_page(cw):
    """One command covering the whole page (tiled pattern, period not a
    divisor of the group width): the page's literal-RECORD count exceeds
    its command count, which round 5's windowed covering-command search
    once mishandled — a name-shadowing bug made the literal search's
    record index advance the command cursor past the cover, breaking
    every group after the first (caught on hardware by bench.py's
    full-batch validation; this pins the minimal repro)."""
    n = 32768
    r = np.random.default_rng(0)
    pat = r.integers(0, 256, 173, dtype=np.uint8).tobytes()
    data = (pat * (n // len(pat) + 1))[:n]
    comp = encode_page(data, is_last=True)
    assert comp is not None
    words, sizes = batch([comp], n)
    s_hint = PD.stream_words_hint([comp])
    for variant in ("fused", "two_phase"):
        out, _ = decode_pages(words, sizes, n, max_cmds_for(n),
                              w_hint=None, s_hint=s_hint,
                              variant=variant, sweep_cw=cw)
        assert np.asarray(out)[0, : n].tobytes() == data, variant


@pytest.mark.parametrize("cw", [2048])
def test_dense_commands_window_retry(cw):
    """> 255 commands per sweep group: the round-5 windowed covering-
    command search must take its retry path (the 256-rank window cannot
    cover a whole group). Hand-built command stream — (ins=1, cpy=2,
    dist=1) triples = 341 commands per 1024 output bytes — because the
    greedy encoder's min match length caps real streams below the
    window."""
    from brotlig_tpu import native
    if not native.available():
        pytest.skip("native encoder unavailable")
    n = 32768
    content = 6144                       # 2048 dense commands, 64 rounds
    ncmd = content // 3
    r = np.random.default_rng(9)
    data = np.repeat(r.integers(0, 256, ncmd, dtype=np.uint8),
                     3).tobytes()
    ins = np.ones(ncmd, np.uint32)
    cpy = np.full(ncmd, 2, np.uint32)
    dist = np.ones(ncmd, np.uint32)
    blob = native.encode_page_cmds(data, True, ins, cpy, dist)
    assert len(blob) < len(data)
    words, sizes = batch([blob], n)
    s_hint = PD.stream_words_hint([blob])
    for variant in ("fused", "two_phase"):
        out, _ = decode_pages(words, sizes, n, max_cmds_for(n),
                              w_hint=None, s_hint=s_hint,
                              variant=variant, sweep_cw=cw)
        assert np.asarray(out)[0, : len(data)].tobytes() == data, variant


def test_max_page_size_pallas():
    """MAX_PAGE_SIZE (128 KiB) pages through BOTH Pallas routes: pins the
    _sweep_pb / _fused_pb VMEM bucketing at the format's upper page bound
    (BrotligConstants.h:83-87 supports 32K/64K/128K uniformly; VERDICT r4
    missing item 5 — only native/XLA covered 128 KiB before)."""
    n = 131072
    datas = [make_data("text", 9000, seed=41),
             make_data("structured", 8192, seed=42)]
    comps = [encode_page(d, is_last=True) for d in datas]
    keep = [(c, d) for c, d in zip(comps, datas) if c is not None]
    assert keep
    words, sizes = batch([c for c, _ in keep], n)
    s_hint = PD.stream_words_hint([c for c, _ in keep])
    outs = []
    for variant in ("fused", "two_phase"):
        out, _ = decode_pages(words, sizes, n, max_cmds_for(n),
                              w_hint=None, s_hint=s_hint,
                              variant=variant, sweep_cw=1024)
        out = np.asarray(out)
        for p, (_, d) in enumerate(keep):
            assert out[p, : len(d)].tobytes() == d, variant
        outs.append(out)
    assert np.array_equal(outs[0], outs[1])


def test_stream_words_hint_covers_actual_layout():
    # the hint must bound the per-stream word cursor reach for every page
    n = 32768
    datas = [make_data(k, 8192, seed=s)
             for k in ("text", "repetitive") for s in (1, 2)]
    comps = [c for c in (encode_page(d, is_last=True) for d in datas)
             if c is not None]
    words, sizes = batch(comps, n)
    from brotlig_tpu.ops.tables import parse_page_headers_full
    *_hdr, stream_bytes = parse_page_headers_full(words, sizes)
    sb = np.asarray(stream_bytes)
    # max stream length in bytes across pages
    ends = np.concatenate([sb[:, 1:], np.asarray(sizes)[:, None]], axis=1)
    max_stream = int((ends - sb).max())
    hint = PD.stream_words_hint(comps)
    assert hint * 4 >= max_stream
