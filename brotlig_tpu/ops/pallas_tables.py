"""Pallas tables kernel: on-chip Huffman table loading.

TPU-native analog of the reference GPU decoder's cooperative in-kernel
table build (BrotliGCompute.hlsl:1198-1203 ``ReadHuffmanCode``, :612-692
``ReadSymbolCodeLengths``): the three per-page Huffman tables (commands,
distances, literals) are decoded from the 32 interleaved sub-streams
entirely inside one Pallas kernel. This is ops/tables.py::load_table —
the lane-speculative RLE decode with post-hoc reconciliation — recast as
an unrolled on-chip loop over [pages, 128-lane] tiles, eliminating the
XLA scan that profiled at ~26% of fused decode wall time (PERF.md
round-3 stage split). The canonical search-structure build
(tables.build_search) stays in XLA: it is one shot of wide vector ops
(~2% of e2e), and its symbol-dictionary scatter has no efficient Mosaic
formulation.

Outputs per-symbol code lengths (chunk-major planes), the trivial-mode
symbol per table, and the per-stream bit cursors after the tables — the
exact values load_table returns, proven equal by
tests/test_pallas_tables.py.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..format import constants as C
from .pallas_decode import NC_DST, NC_ICP, NC_LIT, _LaneOps, _rev15

I32 = jnp.int32
NBS = C.NUM_BITSTREAMS
CL_ORDER = (1, 2, 3, 4, 0, 5, 17, 6, 16, 7, 8, 9, 10, 11, 12, 13, 14, 15)
# fixed simple-tree length rows by tbl_idx (see tables.load_table)
FIXED = ((1, 1, 0, 0), (1, 2, 2, 0), (2, 2, 2, 2), (1, 2, 3, 3))

MAX_PB_T = 32                   # pages per tables-kernel block


def _rev9(v):
    """Bit-reverse the low 9 bits (vectorized)."""
    return _rev15(v) >> 6


def make_tables_kernel(tlc: int, pb: int):
    """Kernel body: 3 sequential table loads over [pb, 128] tiles, lanes
    0..31 = sub-streams. tlc = chunks of the interleaved buffer holding
    every stream's table region (tables end < 40 words per stream)."""
    from jax.experimental import pallas as pl  # noqa: F401

    def kernel(buf_ref, icp_out, dst_out, lit_out, triv_out, bp_out):
        L = _LaneOps(pb)
        lane = L.lane
        roll = L.pltpu.roll
        fetch6 = L.mk_fetch6(buf_ref, tlc)
        extract = L.extract
        bcast = L.bcast_slots

        def lane_at(v, s: int):
            """[pb,128] -> [pb,1] value at lane s."""
            return jnp.sum(jnp.where(lane == s, v, 0), axis=1,
                           keepdims=True)

        def prefix_max32_excl(v, init: int):
            """Exclusive prefix max over lanes 0..31 (lanes >= 32
            unspecified; callers mask)."""
            x = jnp.where(lane >= 1, roll(v, 1, 1), init)
            for shift in (1, 2, 4, 8, 16):
                x = jnp.maximum(
                    x, jnp.where(lane >= shift, roll(x, shift, 1), init))
            return x

        def rows_of(xs, nrows: int, steps: int):
            """Step-major lane values (lanes 0..31) -> item-major rows of
            128 (item g = step g//32, lane g%32; row r packs steps
            4r..4r+3 into lane groups)."""
            rows = []
            for r in range(nrows):
                acc = jnp.zeros((pb, 128), I32)
                for q in range(4):
                    t = 4 * r + q
                    if t < steps:
                        v = jnp.where(lane < NBS, xs[t], 0)
                        acc = acc + (roll(v, 32 * q, 1) if q else v)
                rows.append(acc)
            return rows

        def ladder(rows, idx):
            """Gather rows[idx >> 7][lane = idx & 127]."""
            out = jnp.zeros((pb, 128), I32)
            for r in range(len(rows)):
                g = jnp.take_along_axis(rows[r], idx & 127, axis=1)
                out = jnp.where((idx >> 7) == r, g, out)
            return out

        def load_one(bp, A: int, nc: int, out_ref):
            max_bits = (A - 1).bit_length()
            steps = (A + NBS - 1) // NBS
            nitems = steps * NBS
            nrows = (nitems + 127) // 128

            w = fetch6(bp)
            sh = bcast(bp & 31)
            ttype = lane_at(extract(w, sh, 0, 2), 0)
            m_triv = ttype == 0
            m_simp = ttype == 1
            m_cplx = ttype == 2

            triv_sym = lane_at(extract(w, sh, 6, max_bits), 0)
            triv = jnp.where(m_triv, triv_sym, -1)

            nsym = lane_at(extract(w, sh, 2, 2), 0) + 1
            tsel = lane_at(extract(w, sh, 4, 1), 0)
            tbl_idx = jnp.clip(
                jnp.where(nsym < 4, nsym - 2,
                          jnp.where(tsel == 1, 3, 2)), 0, 3)
            nlen = lane_at(extract(w, sh, 2, 4), 0) + 4

            # per-lane payload reads share one window: lane i holds simple
            # symbol i (max_bits) or complex cl-length i (5 bits), +6 on
            # stream 0 for the shared type/header bits
            hdr6 = jnp.where(lane == 0, 6, 0)
            sym_l = extract(w, sh, hdr6, max_bits)
            clv_l = extract(w, sh, hdr6, 5)

            # --- simple-mode lengths -> local plane rows ---
            splanes = [jnp.zeros((pb, 128), I32) for _ in range(nc)]
            for i in range(4):
                s_i = lane_at(sym_l, i)
                act_i = m_simp & (nsym > i)
                ln_i = jnp.where(
                    tbl_idx == 0, FIXED[0][i],
                    jnp.where(tbl_idx == 1, FIXED[1][i],
                              jnp.where(tbl_idx == 2, FIXED[2][i],
                                        FIXED[3][i])))
                for k in range(nc):
                    hit = act_i & ((s_i >> 7) == k) & (lane == (s_i & 127))
                    splanes[k] = jnp.where(hit, ln_i, splanes[k])

            # --- advance cursors past the header/simple/cl reads ---
            adv = jnp.where(
                lane == 0,
                6 + jnp.where(m_triv | m_simp, max_bits, 0)
                + jnp.where(m_cplx, 5, 0),
                jnp.where(m_simp & (lane < nsym), max_bits, 0)
                + jnp.where(m_cplx & (lane < nlen), 5, 0))
            bp_hdr = bp + jnp.where(lane < NBS, adv, 0)

            # --- complex: code-length-code table over 18 symbols ---
            cl_row = jnp.zeros((pb, 128), I32)
            for i in range(C.CODE_LENGTH_CODES):
                v_i = jnp.where(m_cplx & (nlen > i),
                                lane_at(clv_l, i), 0)
                cl_row = jnp.where(lane == CL_ORDER[i], v_i, cl_row)

            in18 = lane < C.CODE_LENGTH_CODES
            z1 = jnp.zeros((pb, 1), I32)
            counts = [z1]
            for l in range(1, 10):
                counts.append(jnp.sum(
                    jnp.where(in18 & (cl_row == l), 1, 0),
                    axis=1, keepdims=True))
            first = [z1]
            for l in range(1, 10):
                first.append((first[l - 1] + counts[l - 1]) << 1)
            limit = [None]
            for l in range(1, 10):
                limit.append((first[l] + counts[l]) << (9 - l))
            off = [z1, z1]
            for l in range(2, 10):
                off.append(off[l - 1] + counts[l - 1])

            rank = jnp.zeros((pb, 128), I32)
            for l in range(1, 10):
                m = in18 & (cl_row == l)
                pc = L.prefix32_excl(jnp.where(m, 1, 0))
                rank = jnp.where(m, off[l] + pc, rank)
            dict_row = jnp.zeros((pb, 128), I32)
            for s in range(C.CODE_LENGTH_CODES):
                has = lane_at(jnp.where(cl_row > 0, 1, 0), s) > 0
                r_s = lane_at(rank, s)
                dict_row = jnp.where(has & (lane == r_s), s, dict_row)

            # --- speculative RLE decode: lane s owns items s, s+32, ...
            # (junk on non-complex pages / past the real item count; the
            # reconciliation below keeps only real items) ---
            rle_bp = bp_hdr
            bp_hist = [rle_bp]
            syms_t, extra_t = [], []
            for _t in range(steps):
                wt = fetch6(rle_bp)
                sht = bcast(rle_bp & 31)
                idx = _rev9(extract(wt, sht, 0, 9))
                length = jnp.ones((pb, 128), I32)
                for l in range(1, 9):
                    length += (idx >= limit[l]).astype(I32)
                first_l = jnp.zeros((pb, 128), I32)
                off_l = jnp.zeros((pb, 128), I32)
                for l in range(1, 10):
                    sel = length == l
                    first_l = jnp.where(sel, first[l], first_l)
                    off_l = jnp.where(sel, off[l], off_l)
                code = idx >> (9 - length)
                # clip to the cl alphabet exactly like tables.search_decode
                # so even junk speculative lanes agree with the XLA path
                rk = jnp.clip(off_l + code - first_l, 0,
                              C.CODE_LENGTH_CODES - 1)
                sym = jnp.take_along_axis(dict_row, rk, axis=1)
                is16 = sym == C.REPEAT_PREVIOUS_CODE_LENGTH
                is17 = sym == C.REPEAT_ZERO_CODE_LENGTH
                ebits = jnp.where(is16, 2, jnp.where(is17, 3, 0))
                extra = extract(wt, sht, length, ebits)
                rle_bp = rle_bp + jnp.where(lane < NBS, length + ebits, 0)
                syms_t.append(sym)
                extra_t.append(extra)
                bp_hist.append(rle_bp)

            # --- reconciliation (item order = step-major, lane-minor) ---
            tot = jnp.zeros((pb, 1), I32)
            lastkey = jnp.full((pb, 1), -1, I32)
            g_last = jnp.zeros((pb, 1), I32)    # count of items with cum < A
            run_l, val_l = [], []
            for t in range(steps):
                sym = syms_t[t]
                is16 = sym == C.REPEAT_PREVIOUS_CODE_LENGTH
                is17 = sym == C.REPEAT_ZERO_CODE_LENGTH
                lit = ~(is16 | is17)
                run = jnp.where(lane < NBS,
                                jnp.where(lit, 1, extra_t[t] + 3), 0)
                cum = tot + L.prefix32_excl(run) + run
                g_last = g_last + jnp.sum(
                    jnp.where((lane < NBS) & (cum < A), 1, 0),
                    axis=1, keepdims=True)
                key = jnp.where((lane < NBS) & lit,
                                (t * NBS + lane) * 256 + sym, -1)
                pk = jnp.maximum(prefix_max32_excl(key, -1), lastkey)
                prev_val = jnp.where(pk >= 0, pk & 255,
                                     C.INITIAL_REPEATED_CODE_LENGTH)
                val = jnp.where(lit, sym, jnp.where(is16, prev_val, 0))
                lastkey = jnp.maximum(
                    lastkey, jnp.max(jnp.where(lane < NBS, key, -1),
                                     axis=1, keepdims=True))
                tot = tot + jnp.sum(run, axis=1, keepdims=True)
                run_l.append(run)
                val_l.append(val)

            totv = jnp.zeros((pb, 1), I32)
            cumv_l = []
            for t in range(steps):
                gidx = t * NBS + lane
                validg = (lane < NBS) & (gidx <= g_last)
                runv = jnp.where(validg, run_l[t], 0)
                cumv_l.append(totv + L.prefix32_excl(runv) + runv)
                totv = totv + jnp.sum(runv, axis=1, keepdims=True)

            cumv_rows = rows_of(cumv_l, nrows, steps)
            val_rows = rows_of(val_l, nrows, steps)

            # --- run expansion: lengths[pos] = val of covering item ---
            step0 = 1 << (nitems.bit_length() - 1)
            for k in range(nc):
                pos = k * 128 + lane
                cnt = jnp.zeros((pb, 128), I32)
                st = step0
                while st:
                    pc = cnt + st
                    v = ladder(cumv_rows,
                               jnp.clip(pc - 1, 0, nitems - 1))
                    cnt = jnp.where((pc <= nitems) & (v <= pos), pc, cnt)
                    st >>= 1
                cval = ladder(val_rows, jnp.clip(cnt, 0, nitems - 1))
                cval = jnp.where(pos < A, cval, 0)
                out_ref[k] = jnp.where(m_cplx, cval, splanes[k])

            # --- final cursors: lane s consumed n_s real items ---
            n_s = jnp.where((lane < NBS) & (g_last >= lane),
                            (g_last - lane) // NBS + 1, 0)
            bp_done = bp_hist[0]
            for t in range(1, steps + 1):
                bp_done = jnp.where(n_s == t, bp_hist[t], bp_done)
            bp_fin = jnp.where(m_cplx, bp_done, bp_hdr)
            bp_fin = jnp.where(lane < NBS, bp_fin, 0)
            return bp_fin, triv

        bp = jnp.zeros((pb, 128), I32)
        bp, triv_icp = load_one(bp, C.NUM_COMMAND_SYMBOLS_EFFECTIVE,
                                NC_ICP, icp_out)
        bp, triv_dst = load_one(bp, C.NUM_DISTANCE_SYMBOLS, NC_DST,
                                dst_out)
        bp, triv_lit = load_one(bp, C.NUM_LITERAL_SYMBOLS, NC_LIT,
                                lit_out)
        triv_out[:, 0:1] = triv_icp
        triv_out[:, 1:2] = triv_dst
        triv_out[:, 2:3] = triv_lit
        triv_out[:, 3:4] = jnp.zeros((pb, 1), I32)
        bp_out[:] = bp

    return kernel


def _block_pages_t(P: int) -> int:
    if P >= MAX_PB_T:
        if P % MAX_PB_T:
            raise ValueError(f"page batch {P} not a multiple of {MAX_PB_T}")
        return MAX_PB_T
    return P


# Tables end < 40 words into every stream (RLE items + cl codes; see
# tables.narrow_stream_view), and the speculative overshoot stays < 64.
TABLE_WORDS = 64


@partial(jax.jit, static_argnums=(1,))
def load_tables_pallas(buf3: jnp.ndarray, interpret: bool = False):
    """On-chip table load for a batch of interleaved pages.

    buf3: [Wc, P, 128] word-round-robin interleaved buffer
    (pallas_decode._interleave_streams layout).
    Returns (lengths_icp [P, A], lengths_dst, lengths_lit, trivs [P, 3],
    bp_after [P, 32] stream-local bit cursors past the tables) — the
    exact outputs of three chained tables.load_table calls.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    wc, P, _ = buf3.shape
    tlc = min(TABLE_WORDS * NBS // 128, wc)
    pb = _block_pages_t(P)
    kernel = make_tables_kernel(tlc, pb)

    def vspec(shape, imap):
        return pl.BlockSpec(shape, imap, memory_space=pltpu.VMEM)

    out_shape = (
        jax.ShapeDtypeStruct((NC_ICP, P, 128), I32),
        jax.ShapeDtypeStruct((NC_DST, P, 128), I32),
        jax.ShapeDtypeStruct((NC_LIT, P, 128), I32),
        jax.ShapeDtypeStruct((P, 4), I32),
        jax.ShapeDtypeStruct((P, 128), I32),
    )
    out_specs = (
        vspec((NC_ICP, pb, 128), lambda i: (0, i, 0)),
        vspec((NC_DST, pb, 128), lambda i: (0, i, 0)),
        vspec((NC_LIT, pb, 128), lambda i: (0, i, 0)),
        vspec((pb, 4), lambda i: (i, 0)),
        vspec((pb, 128), lambda i: (i, 0)),
    )
    icp3, dst3, lit3, trivs, bp = pl.pallas_call(
        kernel,
        grid=(P // pb,),
        out_shape=out_shape,
        in_specs=[vspec((tlc, pb, 128), lambda i: (0, i, 0))],
        out_specs=out_specs,
        interpret=interpret,
    )(buf3[:tlc])

    def to_lengths(x3, A):
        return x3.transpose(1, 0, 2).reshape(P, -1)[:, :A]

    return (to_lengths(icp3, C.NUM_COMMAND_SYMBOLS_EFFECTIVE),
            to_lengths(dst3, C.NUM_DISTANCE_SYMBOLS),
            to_lengths(lit3, C.NUM_LITERAL_SYMBOLS),
            trivs[:, :3], bp[:, :NBS])
