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
