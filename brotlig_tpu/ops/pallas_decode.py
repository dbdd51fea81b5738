"""Pallas/Mosaic phase-A kernel: on-chip wavefront command+literal decode.

This is the TPU-native analog of the reference's persistent-threads GPU
decoder (BrotliGCompute.hlsl:1349-1432): one kernel instance holds a block
of pages' bitstreams resident in VMEM and runs the whole round loop
on-chip, so the per-round bit-window fetches are VMEM lane-gathers
(~65-100ns each) instead of XLA HBM gathers that re-scan the words operand
every round (the round-1 bottleneck — see PERF.md).

Key layout ideas:

* The 32 sub-streams of each page are re-interleaved word-round-robin
  (word w of stream s at position w*32+s) so all 32 lane cursors stay
  clustered around the decode frontier; the fetch ladder then only touches
  the few active 128-word chunks per round instead of the whole page.
* The interleaved buffer is shaped [Wc, PB, 128]: chunk-major first so a
  traced chunk index selects [PB pages, 128 words] with a (supported)
  dynamic first-dim index, and the per-(page,lane) word select is the one
  gather form Mosaic lowers on TPU: same-shape take_along_axis on the
  128-lane axis.
* Vectors are [PB pages (sublanes), 128 lanes]; lanes carry 32 streams x 4
  word-slots for window fetches and 32 streams x 4 literal batches for
  literal rounds, so literal decode covers 128 symbols per page per trip.
* Huffman decode is the canonical range search (15 limit compares, all
  VPU) + a symbol-dictionary gather laddered over 128-entry chunks; ranks
  are canonical so chunk 0 covers the frequent symbols.
* Command arrays stream out round-by-round over async DMA (double
  buffered, 2D row-block destinations) in [round*page, lane] layout;
  literals go out as 128-wide chunk slots with (start,count) records,
  compacted to a dense queue by the XLA epilogue (finish_pallas).

Everything matches ops/decode.py::_phase_a semantically (same sentinel
rollback, same prev_tail literal rounding, same chunk records), proven by
tests/test_pallas_decode.py equality tests.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..format import constants as C
from . import arith_lut
from .tables import build_search, parse_page_headers_full

I32 = jnp.int32
U32 = jnp.uint32
NBS = C.NUM_BITSTREAMS          # 32 streams
LSLOTS = 4                      # literal batches per chunk (128 lanes / 32)
CHUNK_W = LSLOTS * NBS          # 128 literals per chunk slot
MAX_PB = 64                     # pages per kernel block (VMEM budget)

# symbol-dictionary chunk counts (alphabet padded to 128-lane chunks)
NC_ICP = (C.NUM_COMMAND_SYMBOLS_EFFECTIVE + 127) // 128   # 6
NC_DST = (C.NUM_DISTANCE_SYMBOLS + 127) // 128            # 5
NC_LIT = (C.NUM_LITERAL_SYMBOLS + 127) // 128             # 2


def _rev15(v):
    """Bit-reverse a 15-bit value (vectorized, int32 in/out)."""
    v = v.astype(U32)
    v = ((v & 0x5555) << 1) | ((v >> 1) & 0x5555)
    v = ((v & 0x3333) << 2) | ((v >> 2) & 0x3333)
    v = ((v & 0x0F0F) << 4) | ((v >> 4) & 0x0F0F)
    v = ((v & 0x00FF) << 8) | ((v >> 8) & 0x00FF)
    return (v >> 1).astype(I32)


def _mask_bits(n):
    n = n.astype(U32)
    return jnp.where(n >= 32, jnp.uint32(0xFFFFFFFF),
                     (jnp.uint32(1) << n) - jnp.uint32(1))


class _LaneOps:
    """Per-(pb,128)-tile helpers shared by the phase-A and fused kernels:
    lane bookkeeping, the 6-word window fetch, bit extraction, canonical
    range-search symbol decode, command-field split, and the distance-ring
    prefix scan. Instantiated INSIDE a kernel body (the iotas trace there).
    Factoring these keeps the two kernels' subtle math one implementation;
    the equality tests (tests/test_pallas_decode.py) pin both to the XLA
    wavefront."""

    def __init__(self, pb: int):
        from jax.experimental.pallas import tpu as pltpu
        self.pltpu = pltpu
        self.pb = pb
        self.lane = jax.lax.broadcasted_iota(I32, (pb, 128), 1)
        self.s_of = self.lane & (NBS - 1)    # stream id of a lane
        self.j_of = self.lane >> 5           # slot / literal-batch id
        self.eye = (jax.lax.broadcasted_iota(I32, (pb, 128), 0)
                    == jax.lax.broadcasted_iota(I32, (pb, 128), 1)) \
            .astype(I32)

    def col_to_row(self, v):
        # [pb, 1] page-column -> [1, 128] lane-row, page p at lane p
        # (records are 128-wide so their block spec is tile-aligned)
        return jnp.sum(v * self.eye, axis=0, keepdims=True)

    def bcast_slots(self, v):
        # replicate lanes 0..31 into all four 32-lane slot groups
        roll = self.pltpu.roll
        v0 = jnp.where(self.lane < NBS, v, 0)
        return (v0 + roll(v0, 32, 1) + roll(v0, 64, 1) + roll(v0, 96, 1))

    def mk_fetch6(self, buf_ref, wc: int):
        """Window fetch over the word-round-robin interleaved buffer."""
        pb, lane, s_of, j_of = self.pb, self.lane, self.s_of, self.j_of
        roll = self.pltpu.roll
        bcast_slots = self.bcast_slots

        def fetch6(bp):
            """bp [pb,128] (lanes 0..31 = stream bit cursors,
            stream-local). Returns (w[6] list of [pb,128] int32, lanes
            0..31 valid)."""
            w0 = bcast_slots(bp >> 5)                 # word cursor per slot
            pos1 = (w0 + j_of) * NBS + s_of           # words w0+0..3
            pos2 = (w0 + 4 + j_of) * NBS + s_of       # words w0+4..7 (use 2)
            lim = wc * 128 - 1
            pos1 = jnp.clip(pos1, 0, lim)
            pos2 = jnp.clip(pos2, 0, lim)
            kmin = jnp.min(pos1) >> 7
            kmax = jnp.max(pos2) >> 7

            def body(k, carry):
                g1, g2 = carry
                chunk = buf_ref[k]                    # [pb, 128]
                a = jnp.take_along_axis(chunk, pos1 & 127, axis=1)
                b = jnp.take_along_axis(chunk, pos2 & 127, axis=1)
                g1 = jnp.where((pos1 >> 7) == k, a, g1)
                g2 = jnp.where((pos2 >> 7) == k, b, g2)
                return g1, g2

            g1, g2 = jax.lax.fori_loop(
                kmin, kmax + 1, body,
                (jnp.zeros((pb, 128), I32), jnp.zeros((pb, 128), I32)))
            return [g1,
                    roll(g1, 128 - 32, 1),
                    roll(g1, 128 - 64, 1),
                    roll(g1, 128 - 96, 1),
                    g2,
                    roll(g2, 128 - 32, 1)]

        return fetch6

    def extract(self, w, sh, delta, nbits):
        """Bits [sh+delta, +nbits) from the 6-word window (lanes 0..31)."""
        off = sh + delta
        widx = off >> 5
        bo = (off & 31).astype(U32)
        lo = w[0].astype(U32)
        hi = w[1].astype(U32)
        for k in range(1, 6):
            sel = widx == k
            lo = jnp.where(sel, w[k].astype(U32), lo)
            nxt = w[k + 1].astype(U32) if k + 1 < 6 else jnp.uint32(0)
            hi = jnp.where(sel, nxt, hi)
        win = (lo >> bo) | jnp.where(bo == 0, jnp.uint32(0),
                                     hi << (jnp.uint32(32) - bo))
        n = jnp.asarray(nbits)
        return jnp.where(n == 0, jnp.uint32(0),
                         win & _mask_bits(n)).astype(I32)

    def decode_sym(self, win15, lim_ref, first_ref, off_ref, triv_ref,
                   dict_ref, nchunks):
        """Canonical range-search decode + laddered dictionary gather.

        Code length = 1 + #{l in 1..14 : idx >= limit[l]}; limit[] is
        monotone nondecreasing (left-aligned canonical limits), so a
        4-step binary search + two dynamic gathers of first/offset
        replace the 14-compare / 30-select ladders — ~3x fewer vector
        ops in the sequence the inner loops run 2-6x per iteration."""
        pb = self.pb
        idx = _rev15(win15)
        lim = lim_ref[...]
        cnt = jnp.zeros((pb, 128), I32)
        for step in (8, 4, 2, 1):
            nxt = cnt + step
            v = jnp.take_along_axis(lim, nxt, axis=1)
            cnt = jnp.where((nxt <= C.HUFFMAN_NUM_CODE_LENGTH - 1)
                            & (idx >= v), nxt, cnt)
        length = cnt + 1
        first_l = jnp.take_along_axis(first_ref[...], length, axis=1)
        off_l = jnp.take_along_axis(off_ref[...], length, axis=1)
        code = idx >> (C.HUFFMAN_TABLE_BITS - length)
        rank = jnp.clip(off_l + code - first_l, 0, nchunks * 128 - 1)
        sym = jnp.zeros((pb, 128), I32)
        for k in range(nchunks):
            g = jnp.take_along_axis(dict_ref[k], rank & 127, axis=1)
            sym = jnp.where((rank >> 7) == k, g, sym)
        triv = triv_ref[:, 0:1]
        is_t = triv >= 0
        sym = jnp.where(is_t, triv, sym)
        length = jnp.where(is_t, 0, length)
        return sym, length

    def decode_cmd_fields(self, sym):
        """Command symbol -> (insert/copy codes, base/extra-bit widths,
        is_norm, is_sent)."""
        is_norm = sym < C.NUM_COMMAND_SYMBOLS
        is_sent = sym == C.SENTINEL_COMMAND
        is_insonly = sym > C.NUM_COMMAND_SYMBOLS
        ic_n, cc_n = arith_lut.split_command(sym)
        inscode = jnp.where(is_insonly, sym - C.NUM_COMMAND_SYMBOLS,
                            jnp.where(is_norm, ic_n, 0))
        inscode = jnp.clip(inscode, 0, 23)
        copycode = jnp.clip(jnp.where(is_norm, cc_n, 0), 0, 23)
        ins_bits = jnp.where(is_sent, 0, arith_lut.insert_extra(inscode))
        ins_base = jnp.where(is_sent, 0, arith_lut.insert_base(inscode))
        cpy_bits = jnp.where(is_norm, arith_lut.copy_extra(copycode), 0)
        cpy_base = jnp.where(is_norm, arith_lut.copy_base(copycode), 0)
        return ins_bits, ins_base, cpy_bits, cpy_base, is_norm, is_sent

    def resolve_ring(self, dcode, dextra, npf, ndir, rin, active):
        """Distance-ring resolution (TranslateDistance semantics,
        PageDecoder.cpp:345-404) as a prefix scan over lane transforms.
        Each lane maps ring_in -> ring_out; a transform is 4 slots of
        (src, val): src -1 = constant val, src k = ring_in[k] + val. That
        class is closed under composition, so 5 Hillis-Steele steps
        resolve all 32 lanes exactly. Returns (dist, ring_out list)."""
        pb, lane = self.pb, self.lane
        roll = self.pltpu.roll
        code = dcode
        is_rel = (code >= 0) & (code < 16)
        depth = jnp.where(code < 4, jnp.maximum(code, 0),
                          jnp.where(code < 10, 0, 1))
        dmag = (jnp.maximum(code - 4, 0) % 6) // 2 + 1
        delta = jnp.where((code >= 4) & is_rel,
                          jnp.where((code & 1) == 1, dmag, -dmag), 0)
        sc = jnp.maximum(code - ndir - 16, 0)
        nb = 1 + (sc >> (npf + 1))
        hc = sc >> npf
        lc = sc & ((1 << npf) - 1)
        offs = ((2 + (hc & 1)) << nb) - 4
        longv = ((offs + dextra) << npf) + lc + ndir + 1
        absv = jnp.where(code < 16 + ndir, code - 15, longv)
        is_push = code > 0

        def sel4(j, a0, a1, a2, a3):
            return jnp.where(j == 0, a0,
                             jnp.where(j == 1, a1,
                                       jnp.where(j == 2, a2, a3)))

        # per-lane transform (identity on non-push lanes)
        s0 = jnp.where(is_push, jnp.where(is_rel, depth, -1), 0)
        v0 = jnp.where(is_push, jnp.where(is_rel, delta, absv), 0)
        s1 = jnp.where(is_push, 0, 1)
        s2 = jnp.where(is_push, 1, 2)
        s3 = jnp.where(is_push, 2, 3)
        v1 = jnp.zeros((pb, 128), I32)
        v2 = jnp.zeros((pb, 128), I32)
        v3 = jnp.zeros((pb, 128), I32)
        T = [(s0, v0), (s1, v1), (s2, v2), (s3, v3)]
        for shift in (1, 2, 4, 8, 16):
            A = []
            for si, (sk, vk) in enumerate(T):
                rs = roll(sk, shift, 1)
                rv = roll(vk, shift, 1)
                A.append((jnp.where(lane >= shift, rs, si),
                          jnp.where(lane >= shift, rv, 0)))
            Tn = []
            for sk, vk in T:
                js = jnp.clip(sk, 0, 3)
                as_ = sel4(js, A[0][0], A[1][0], A[2][0], A[3][0])
                av = sel4(js, A[0][1], A[1][1], A[2][1], A[3][1])
                Tn.append((jnp.where(sk == -1, sk, as_),
                           jnp.where(sk == -1, vk, av + vk)))
            T = Tn

        # exclusive prefix for each lane's ring-before
        E = []
        for si, (sk, vk) in enumerate(T):
            rs = roll(sk, 1, 1)
            rv = roll(vk, 1, 1)
            E.append((jnp.where(lane >= 1, rs, si),
                      jnp.where(lane >= 1, rv, 0)))

        def apply_slot(se, ve):
            base = sel4(jnp.clip(se, 0, 3), *rin)
            return jnp.where(se == -1, ve, base + ve)

        dsel = jnp.clip(depth, 0, 3)
        se_d = sel4(dsel, E[0][0], E[1][0], E[2][0], E[3][0])
        ve_d = sel4(dsel, E[0][1], E[1][1], E[2][1], E[3][1])
        ring_d = apply_slot(se_d, ve_d)
        dist = jnp.where(code >= 16, absv,
                         jnp.where(is_rel, ring_d + delta, 0))

        # fold the round's full composite into the carried ring
        rin_n = []
        for si in range(4):
            s31 = T[si][0][:, 31:32]
            v31 = T[si][1][:, 31:32]
            rin_n.append(jnp.where(active, apply_slot(s31, v31),
                                   rin[si]))
        return dist, rin_n

    def prefix32_excl(self, v):
        """Exclusive prefix sum over lanes 0..31 (values outside lanes
        0..31 must be zero)."""
        roll = self.pltpu.roll
        lane = self.lane
        x = v
        for shift in (1, 2, 4, 8, 16):
            x = x + jnp.where(lane >= shift, roll(x, shift, 1), 0)
        return x - v


def make_phase_a_kernel(page_size: int, max_cmds: int, wc: int,
                        max_chunks: int, pb: int):
    """Build the phase-A kernel body for static (page_size, max_cmds, Wc,
    pages-per-block)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    R = max_cmds // NBS          # worst-case command rounds
    lit_cap = page_size + 64
    maxc1 = max_chunks - 1
    maxc4 = (max_chunks + 3) // 4

    def kernel(buf_ref, bp0_ref, npd_ref,
               icp_lim, icp_first, icp_off, icp_triv, icp_dict,
               dst_lim, dst_first, dst_off, dst_triv, dst_dict,
               lit_lim, lit_first, lit_off, lit_triv, lit_dict,
               cmd_out, lit_out,
               rec_out, ncmds_out, stats_out,
               stage_cmd, stage_lit, sem_cmd, sem_lit):
        blk = pl.program_id(0)
        nblk = pl.num_programs(0)
        L = _LaneOps(pb)
        lane, s_of, j_of = L.lane, L.s_of, L.j_of
        col_to_row = L.col_to_row
        bcast_slots = L.bcast_slots

        # packed (start << 8 | count) records; defaults keep unwritten
        # chunk starts sorted for the compaction, count = 0
        rec_out[:] = jnp.full((max_chunks, 128), lit_cap << 8, I32)

        npf = npd_ref[:, 0:1]
        ndir = npd_ref[:, 1:2]

        fetch6 = L.mk_fetch6(buf_ref, wc)
        extract = L.extract
        decode_sym = L.decode_sym

        # ---- literal chunks: 4 chained batches of 32 literals each ----
        def lit_block(w, sh, delta, lbase, rlit):
            """One 128-literal chunk from an already-fetched window,
            chaining the bit-consumption prefix `delta`."""
            block = jnp.zeros((pb, 128), I32)
            for jj in range(LSLOTS):
                win15 = extract(w, sh, delta, 15)
                sym, ln = decode_sym(win15, lit_lim, lit_first, lit_off,
                                     lit_triv, lit_dict, NC_LIT)
                active = ((lbase + jj * NBS + s_of) < rlit) & (lane < NBS)
                delta = delta + jnp.where(active, ln, 0)
                placed = pltpu.roll(jnp.where(lane < NBS, sym, 0),
                                    32 * jj, 1) if jj else \
                    jnp.where(lane < NBS, sym, 0)
                block = jnp.where(j_of == jj, placed, block)
                # carry the consumed-bits prefix to the next batch's lanes
                delta = bcast_slots(delta)
            return block, delta

        def emit_chunk(block, cidx, qtail, lbase, rlit, pk):
            cw = jnp.minimum(cidx, maxc1)
            # pack 4 slot chunks per int32 word (byte q = chunk 4a+q at
            # the same lane); DMA one packed row per 4 chunks
            q = cidx & 3
            pk = jnp.where(q == 0, block, pk | (block << (q * 8)))

            @pl.when(q == 3)
            def _():
                d = cidx >> 2
                slot = d & 1

                @pl.when(d >= 2)
                def _():
                    pltpu.make_async_copy(
                        stage_lit.at[slot],
                        lit_out.at[pl.ds(jnp.minimum(d - 2, maxc4 - 1)
                                         * (nblk * pb) + blk * pb, pb), :],
                        sem_lit.at[slot]).wait()
                stage_lit[slot] = pk
                pltpu.make_async_copy(
                    stage_lit.at[slot],
                    lit_out.at[pl.ds(jnp.minimum(d, maxc4 - 1)
                                     * (nblk * pb) + blk * pb, pb), :],
                    sem_lit.at[slot]).start()

            start = qtail + jnp.minimum(lbase, rlit)
            count = jnp.clip(rlit - lbase, 0, CHUNK_W)
            rec_out[pl.ds(cw, 1), :] = col_to_row((start << 8) | count)
            return pk

        def lit_chunk(lbase, bp, cidx, qtail, rlit, pk):
            w = fetch6(bp)
            sh = bcast_slots(bp & 31)
            block, delta = lit_block(w, sh, jnp.zeros((pb, 128), I32),
                                     lbase, rlit)
            bp = bp + jnp.where(lane < NBS, delta, 0)
            pk = emit_chunk(block, cidx, qtail, lbase, rlit, pk)
            return bp, cidx + 1, pk

        def lit_chunk_pair(lbase, bp, cidx, qtail, rlit, pk):
            """TWO chunks per window fetch: 8 batches consume <= 151 of
            the 192-bit hold, halving the literal loop's fetch + sync
            trips (round 5; trips were ~79% of phase-A iterations)."""
            w = fetch6(bp)
            sh = bcast_slots(bp & 31)
            delta = jnp.zeros((pb, 128), I32)
            block, delta = lit_block(w, sh, delta, lbase, rlit)
            pk = emit_chunk(block, cidx, qtail, lbase, rlit, pk)
            block, delta = lit_block(w, sh, delta, lbase + CHUNK_W, rlit)
            pk = emit_chunk(block, cidx + 1, qtail, lbase + CHUNK_W,
                            rlit, pk)
            bp = bp + jnp.where(lane < NBS, delta, 0)
            return bp, cidx + 2, pk

        # ---- command round ----
        def round_body(carry):
            (r, cidx, bp, done, ncmds, prev_tail, qtail,
             rin0, rin1, rin2, rin3, pk) = carry
            active = (done == 0)                       # [pb, 1]

            w = fetch6(bp)
            sh = bcast_slots(bp & 31)
            win15 = extract(w, sh, 0, 15)
            sym, ln = decode_sym(win15, icp_lim, icp_first, icp_off,
                                 icp_triv, icp_dict, NC_ICP)
            is_norm = sym < C.NUM_COMMAND_SYMBOLS
            is_sent = sym == C.SENTINEL_COMMAND
            (ins_bits, ins_base, cpy_bits, cpy_base,
             _, _) = L.decode_cmd_fields(sym)

            ins_extra = extract(w, sh, ln, ins_bits)
            cpy_extra = extract(w, sh, ln + ins_bits, cpy_bits)
            insert_len = ins_base + ins_extra
            copy_len = cpy_base + cpy_extra
            bp1 = bp + ln
            d_off = ln + ins_bits + cpy_bits

            need_dist = is_norm & (sym >= 128)
            dwin = extract(w, sh, d_off, 15)
            dsym, dln = decode_sym(dwin, dst_lim, dst_first, dst_off,
                                   dst_triv, dst_dict, NC_DST)
            dln_eff = jnp.where(need_dist, dln, 0)
            is_long = dsym >= (16 + ndir)
            dnb = jnp.where(need_dist & is_long,
                            1 + (jnp.maximum(dsym - ndir - 16, 0)
                                 >> (npf + 1)), 0)
            dnb = jnp.clip(dnb, 0, 30)
            dextra = extract(w, sh, d_off + dln_eff, dnb)
            bp4 = bp + d_off + dln_eff + dnb

            # sentinel lane + rollback
            sent_lane = jnp.where(is_sent & (lane < NBS), lane, NBS)
            k = jnp.min(sent_lane, axis=1, keepdims=True)     # [pb, 1]
            k = jnp.where(active, k, 0)
            valid = active & (lane < k)
            bp = jnp.where(valid, bp4,
                           jnp.where(active & (lane == k), bp1, bp))

            insert_len = jnp.where(valid, insert_len, 0)
            copy_len = jnp.where(valid, copy_len, 0)
            dcode = jnp.where(valid & need_dist, dsym,
                              jnp.where(valid & is_norm, 0, -1))
            dextra = jnp.where(valid, dextra, 0)

            dist, rin_n = L.resolve_ring(dcode, dextra, npf, ndir,
                                         [rin0, rin1, rin2, rin3], active)
            rin0_n, rin1_n, rin2_n, rin3_n = rin_n

            # stream the round's 32 commands per page out over DMA; the four
            # fields share one 128-lane row (slot f = lanes 32f..32f+31) so
            # the DMA slice is tile-aligned and one copy covers the round
            slot = r & 1

            def cmd_dma(sl, rr):
                return pltpu.make_async_copy(
                    stage_cmd.at[sl],
                    cmd_out.at[pl.ds(rr * (nblk * pb) + blk * pb, pb), :],
                    sem_cmd.at[sl])

            @pl.when(r >= 2)
            def _():
                cmd_dma(slot, r - 2).wait()
            lane32 = lane < NBS
            stage_cmd[slot] = (
                jnp.where(lane32, insert_len, 0)
                + pltpu.roll(jnp.where(lane32, copy_len, 0), 32, 1)
                + pltpu.roll(jnp.where(lane32, dist, 0), 64, 1))
            cmd_dma(slot, r).start()

            ncmds = ncmds + jnp.where(active, k, 0)

            # literal batches for this round
            litcount = jnp.sum(insert_len, axis=1, keepdims=True)
            bs = k
            aclit = jnp.maximum(litcount - prev_tail, 0)
            mult = jnp.where(bs > 0, (aclit + bs - 1)
                             // jnp.maximum(bs, 1), 0)
            rlit = jnp.where(active, bs * mult, 0)               # [pb, 1]
            prev_tail = jnp.where(active, rlit + prev_tail - litcount,
                                  prev_tail)

            bp, cidx, pk = lit_chunk(jnp.int32(0), bp, cidx, qtail, rlit,
                                     pk)

            def lit_cond(c):
                lbase, *_ = c
                return lbase < jnp.max(rlit)

            def lit_body(c):
                lbase, bp, cidx, pk = c
                bp, cidx, pk = lit_chunk_pair(lbase, bp, cidx, qtail,
                                              rlit, pk)
                return lbase + 2 * CHUNK_W, bp, cidx, pk

            _, bp, cidx, pk = jax.lax.while_loop(
                lit_cond, lit_body, (jnp.int32(CHUNK_W), bp, cidx, pk))
            qtail = qtail + rlit

            done = jnp.where(active & (k < NBS), 1, done)
            return (r + 1, cidx, bp, done, ncmds, prev_tail, qtail,
                    rin0_n, rin1_n, rin2_n, rin3_n, pk)

        def round_cond(carry):
            r, _, _, done, *_ = carry
            return (jnp.min(done) == 0) & (r < R)

        init = (jnp.int32(0), jnp.int32(0), bp0_ref[:],
                jnp.zeros((pb, 1), I32), jnp.zeros((pb, 1), I32),
                jnp.zeros((pb, 1), I32), jnp.zeros((pb, 1), I32),
                jnp.full((pb, 1), 4, I32), jnp.full((pb, 1), 11, I32),
                jnp.full((pb, 1), 15, I32), jnp.full((pb, 1), 16, I32),
                jnp.zeros((pb, 128), I32))
        (r_f, cidx_f, _, _, ncmds, _pt, _qt, _r0, _r1, _r2, _r3,
         pk_f) = jax.lax.while_loop(round_cond, round_body, init)

        # flush a partial packed literal row, then drain outstanding DMAs
        nd0 = cidx_f >> 2                  # full packed rows DMA'd so far

        @pl.when((cidx_f & 3) != 0)
        def _():
            slot = nd0 & 1

            @pl.when(nd0 >= 2)
            def _():
                pltpu.make_async_copy(
                    stage_lit.at[slot],
                    lit_out.at[pl.ds(jnp.minimum(nd0 - 2, maxc4 - 1)
                                     * (nblk * pb) + blk * pb, pb), :],
                    sem_lit.at[slot]).wait()
            stage_lit[slot] = pk_f
            pltpu.make_async_copy(
                stage_lit.at[slot],
                lit_out.at[pl.ds(jnp.minimum(nd0, maxc4 - 1)
                                 * (nblk * pb) + blk * pb, pb), :],
                sem_lit.at[slot]).start()

        ndma = (cidx_f + 3) >> 2
        for back in (2, 1):
            @pl.when(r_f >= back)
            def _(back=back):
                sl = (r_f - back) & 1
                pltpu.make_async_copy(
                    stage_cmd.at[sl],
                    cmd_out.at[pl.ds((r_f - back) * (nblk * pb) + blk * pb,
                                     pb), :],
                    sem_cmd.at[sl]).wait()
            @pl.when(ndma >= back)
            def _(back=back):
                sl = (ndma - back) & 1
                pltpu.make_async_copy(
                    stage_lit.at[sl],
                    lit_out.at[pl.ds(jnp.minimum(ndma - back, maxc4 - 1)
                                     * (nblk * pb) + blk * pb, pb), :],
                    sem_lit.at[sl]).wait()

        ncmds_out[:, 0:1] = ncmds
        stats_out[:, 0:1] = jnp.broadcast_to(cidx_f, (pb, 1))
        stats_out[:, 1:2] = jnp.broadcast_to(r_f, (pb, 1))

    return kernel


# ---------------------------------------------------------------------------
# XLA-side wrapper
# ---------------------------------------------------------------------------

def _parse_and_interleave(words, in_sizes, wl: int):
    """Header + size-table parse (against a HEADER_WORDS slice — all
    their bits live there) and the stream interleave: the single full
    pass over the page bytes. Returns (buf3 [Wc,P,128], npostfix,
    ndirect, isdelta)."""
    from .tables import HEADER_WORDS

    W = words.shape[1]
    npostfix, ndirect, isdelta, _, stream_bytes = \
        parse_page_headers_full(words[:, :min(W, HEADER_WORDS)], in_sizes)
    buf3 = _interleave_streams(words, stream_bytes, wl)
    return buf3, npostfix, ndirect, isdelta


def _tables_from_buf(buf3, interpret: bool):
    """Huffman tables via the on-chip Pallas loader (pallas_tables.py —
    replaces the XLA speculative-RLE scan that profiled at ~26% of fused
    e2e, PERF.md round-3), then the canonical search-structure build in
    XLA (one shot of wide vector ops, ~2%).

    Returns (bp_local [P,32] stream-local cursors past the tables,
    [(packed_search, trivial)] x 3)."""
    from .pallas_tables import load_tables_pallas

    icp_len, dst_len, lit_len, trivs, bp_local = \
        load_tables_pallas(buf3, interpret)

    def mk(lengths):
        return build_search(lengths, C.HUFFMAN_NUM_CODE_LENGTH,
                            C.HUFFMAN_TABLE_BITS)
    return bp_local, (
        (_pack_search(mk(icp_len), NC_ICP), trivs[:, 0]),
        (_pack_search(mk(dst_len), NC_DST), trivs[:, 1]),
        (_pack_search(mk(lit_len), NC_LIT), trivs[:, 2]))


def _interleave_streams(words, stream_bytes, wl: int):
    """[P, W] page words + [P, 32] stream byte offsets -> [Wc, P, 128]
    word-round-robin interleaved buffer (word w of stream s at w*32+s)."""
    P, W = words.shape
    # word index of (w, s) is (stream_bytes[s] >> 2) + w exactly, so the
    # "+1 word" operand of the unaligned shift is the next w's gather
    # result: fetch wl+1 words per stream once instead of two gathers
    w_idx = jnp.arange(wl + 1, dtype=I32)
    byte0 = stream_bytes[:, None, :] + 4 * w_idx[None, :, None]
    flat = byte0.reshape(P, (wl + 1) * NBS)
    lo_i = jnp.clip(flat >> 2, 0, W - 1)
    g = jnp.take_along_axis(words, lo_i, axis=1)
    g1 = g[:, : wl * NBS].astype(U32)
    g2 = g[:, NBS:].astype(U32)
    sh = (((flat[:, : wl * NBS]) & 3) * 8).astype(U32)
    val = (g1 >> sh) | jnp.where(sh == 0, jnp.uint32(0),
                                 g2 << (jnp.uint32(32) - sh))
    wc = wl * NBS // 128
    return val.astype(I32).reshape(P, wc, 128).transpose(1, 0, 2)


def _pack_search(search, nchunks: int):
    """build_search dict -> (limit/first/offset [P, 128], dict3 [NC, P, 128]).

    limit/first/offset are lane-padded to the full 128-wide tile so the
    kernels' binary-search gathers see an operand shaped like their
    indices (Mosaic's gather lowering requires equal shapes)."""
    P, A = search["symdict"].shape
    def pad128(x):
        return jnp.pad(x, ((0, 0), (0, 128 - x.shape[1])))
    d = jnp.pad(search["symdict"], ((0, 0), (0, nchunks * 128 - A)))
    d3 = d.reshape(P, nchunks, 128).transpose(1, 0, 2)
    return (pad128(search["limit"]), pad128(search["first"]),
            pad128(search["offset"]), d3)


def _block_pages(P: int) -> int:
    if P >= MAX_PB:
        if P % MAX_PB:
            raise ValueError(f"page batch {P} not a multiple of {MAX_PB}")
        return MAX_PB
    return P


@partial(jax.jit, static_argnums=(2, 3, 4, 5))
def phase_a_pallas(words: jnp.ndarray, in_sizes: jnp.ndarray,
                   page_size: int, max_cmds: int, wl: int,
                   interpret: bool = False):
    """Headers in XLA, tables on-chip, then the Pallas phase-A kernel.

    wl: static per-stream word capacity (host hint; see stream_words_hint).
    Returns (ncmds [P], lit chunks [maxC*P, 128], ch_start/ch_count
    [maxC, P], cmd arrays [R*P, 32] x4, npostfix, ndirect, isdelta,
    stats [P, 2] = (chunks used, rounds used))."""
    buf3, npostfix, ndirect, isdelta = \
        _parse_and_interleave(words, in_sizes, wl)
    return phase_a_from_buf(buf3, npostfix, ndirect, isdelta,
                            page_size, max_cmds, interpret)


@partial(jax.jit, static_argnums=(4, 5, 6))
def phase_a_from_buf(buf3: jnp.ndarray, npostfix, ndirect, isdelta,
                     page_size: int, max_cmds: int,
                     interpret: bool = False):
    """Phase A from an already-interleaved buffer (host-staged or
    _parse_and_interleave): on-chip table load, then the phase-A kernel."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    P = buf3.shape[1]
    pb = _block_pages(P)
    bp_local, tabs = _tables_from_buf(buf3, interpret)
    (icp_s, icp_triv), (dst_s, dst_triv), (lit_s, lit_triv) = tabs
    wc = buf3.shape[0]
    bp0 = jnp.pad(bp_local, ((0, 0), (0, 128 - NBS)))
    npd = jnp.stack([npostfix, ndirect], axis=1)

    R = max_cmds // NBS
    lit_cap = page_size + 64
    max_chunks = R + 4 * (lit_cap // CHUNK_W) + 2

    kernel = make_phase_a_kernel(page_size, max_cmds, wc, max_chunks, pb)
    grid = (P // pb,)

    def vspec(shape, imap):
        return pl.BlockSpec(shape, imap, memory_space=pltpu.VMEM)

    def page_spec(cols):
        return vspec((pb, cols), lambda i: (i, 0))

    def dict_spec(nc):
        return vspec((nc, pb, 128), lambda i: (0, i, 0))

    any_spec = pl.BlockSpec(memory_space=pl.ANY)

    in_specs = [
        vspec((wc, pb, 128), lambda i: (0, i, 0)),    # buf3
        page_spec(128),                               # bp0 (padded)
        page_spec(2),                                 # npd
    ]
    for nc in (NC_ICP, NC_DST, NC_LIT):
        in_specs += [page_spec(128), page_spec(128), page_spec(128),
                     page_spec(1), dict_spec(nc)]

    nblk = P // pb
    out_shape = (
        jax.ShapeDtypeStruct((R * P, 128), jnp.int32),     # packed cmds
        jax.ShapeDtypeStruct((((max_chunks + 3) // 4) * P, CHUNK_W),
                             jnp.int32),   # packed literal rows
        jax.ShapeDtypeStruct((max_chunks, nblk * 128), jnp.int32),  # records
        jax.ShapeDtypeStruct((P, 1), jnp.int32),           # ncmds
        jax.ShapeDtypeStruct((P, 2), jnp.int32),           # stats
    )
    out_specs = (
        any_spec, any_spec,
        vspec((max_chunks, 128), lambda i: (0, i)),
        vspec((pb, 1), lambda i: (i, 0)),
        vspec((pb, 2), lambda i: (i, 0)),
    )

    outs = pl.pallas_call(
        kernel,
        grid=grid,
        out_shape=out_shape,
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=[
            pltpu.VMEM((2, pb, 128), jnp.int32),      # stage_cmd (packed)
            pltpu.VMEM((2, pb, CHUNK_W), jnp.int32),  # stage_lit
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(buf3, bp0, npd,
      icp_s[0], icp_s[1], icp_s[2], icp_triv[:, None], icp_s[3],
      dst_s[0], dst_s[1], dst_s[2], dst_triv[:, None], dst_s[3],
      lit_s[0], lit_s[1], lit_s[2], lit_triv[:, None], lit_s[3])
    (cmd_t, lit_t, rec, ncmds, stats) = outs
    # packed records: [max_chunks, nblk*128] 128-wide rows -> [max_chunks, P]
    rec = rec.reshape(max_chunks, nblk, 128)[:, :, :pb].reshape(-1, P)
    chs = rec >> 8
    chc = rec & 255
    return (ncmds[:, 0], lit_t, chs, chc, cmd_t,
            npostfix, ndirect, isdelta, stats)


@partial(jax.jit, static_argnums=(3, 4, 5))
def finish_pallas(lit_t, chs, chc, page_size: int, cbucket: int,
                  lit_cap: int):
    P = chs.shape[1]
    return _compact_literals(_unpack_slot_rows(lit_t, P), chs, chc,
                             page_size, cbucket, lit_cap)


def _unpack_slot_rows(lit_t, P: int):
    """Packed kernel rows [maxc4*P, 128] (row = word-chunk major, then
    page) -> unpacked [4*maxc4*P, 128] byte rows in slot-chunk-major
    order (the layout _compact_literals expects)."""
    W = lit_t.shape[1]
    x = lit_t.reshape(-1, P, W)
    parts = [(x >> (8 * q)) & 255 for q in range(4)]
    return jnp.stack(parts, axis=1).reshape(-1, W)


def _compact_literals(lit_t, chs, chc, page_size: int, cbucket: int,
                      lit_cap: int):
    """Compact literal chunk slots into the dense per-page literal queue.

    Same scatter-max + cummax covering-chunk search as the XLA phase A
    (ops/decode.py), operating on the kernel's chunk-major layout."""
    maxC, P = chs.shape
    slotbuf = lit_t[: cbucket * P].reshape(cbucket, P, CHUNK_W) \
        .transpose(1, 0, 2).reshape(P, cbucket * CHUNK_W)
    ch_start = chs.T                                    # [P, maxC]
    ch_count = chc.T
    q = jnp.broadcast_to(jnp.arange(lit_cap, dtype=I32)[None, :],
                         (P, lit_cap))
    rows = jnp.arange(P, dtype=I32)[:, None]
    chunk_ids = jnp.broadcast_to(jnp.arange(maxC, dtype=I32)[None, :],
                                 (P, maxC))
    nonempty = ch_count > 0
    cpos = jnp.where(nonempty, jnp.clip(ch_start, 0, lit_cap), lit_cap)
    cmark = jnp.zeros((P, lit_cap), I32)
    cmark = cmark.at[rows, cpos].max(chunk_ids, mode="drop")
    chunk_of = jnp.clip(jax.lax.cummax(cmark, axis=1), 0, cbucket - 1)
    st = jnp.take_along_axis(ch_start, chunk_of, axis=1)
    slot = jnp.clip(chunk_of * CHUNK_W + (q - st), 0,
                    cbucket * CHUNK_W - 1)
    litbuf = jnp.take_along_axis(slotbuf, slot, axis=1).astype(jnp.uint8)
    return litbuf[:, :page_size]


@partial(jax.jit, static_argnums=(1, 2))
def cmds_from_rounds(cmd_t, P: int, rbucket: int):
    return _cmds_split(cmd_t, P, rbucket)


def _cmds_split(cmd_t, P: int, rbucket: int):
    """[R*P, 128] packed round-major kernel output -> four [P, rbucket*32]
    command arrays (ins, cpy, dcode, dextra = lane slots 0..3)."""
    x = cmd_t[: rbucket * P].reshape(rbucket, P, 4, NBS).transpose(1, 0, 2, 3)
    x = x.transpose(0, 2, 1, 3).reshape(P, 4, rbucket * NBS)
    return x[:, 0], x[:, 1], x[:, 2], x[:, 3]


@partial(jax.jit, static_argnums=(6, 7, 8, 9, 10))
def finish_decode_pallas(ncmds, lit_t, chs, chc, cmd_t, npd,
                         page_size: int, cbucket: int, rbucket: int,
                         interpret: bool = False, sweep_cw: int = 128):
    """Single-dispatch finish path: literal compaction + command split +
    phase-B chunk-sweep kernel, all in one compiled program."""
    P = ncmds.shape[0]
    ins_a, cpy_a, dist_a, _ = _cmds_split(cmd_t, P, rbucket)
    # phase A already emitted the slots packed 4-bytes-per-word: hand the
    # rows straight to phase B (pb shrinks for big chunk counts to stay
    # inside VMEM; see _sweep_pb)
    cb4 = (cbucket + 3) // 4
    slots4 = lit_t[: cb4 * P].reshape(cb4, P, CHUNK_W)
    recs = chs[:cbucket].T
    return _phase_b_sweep(ncmds, slots4, cbucket, recs, ins_a, cpy_a,
                          dist_a, None, npd, page_size, interpret,
                          resolved=True, sweep_cw=sweep_cw)


# ---------------------------------------------------------------------------
# Phase B: chunk-sweep LZ77 execution kernel
# ---------------------------------------------------------------------------
#
# TPU-native analog of the reference GPU kernel's copy loop
# (BrotliGCompute.hlsl:1401-1419): the output page lives in VMEM and is
# produced 128 bytes per step, left to right, so every copy source reads
# already-final bytes from on-chip memory. Replaces the XLA pointer-doubling
# chase (ops/decode.py::_phase_b), whose every iteration gathers a [P, 64K]
# operand from HBM.
#
# Per 128-byte output chunk:
#   1. covering command per lane: the commands are sorted by output start,
#      so an 8-step per-lane binary search over a 256-command sliding
#      window (take_along_axis probes) finds the rank — no scatter needed;
#   2. copy sources are rebased with the closed-form overlap escape
#      src = cstart - d + (pos - cstart) % d  (always outside the copy's
#      own region, cf. ops/decode.py phase B), so in-chunk chains only hop
#      across commands and 7 map-doubling rounds resolve them;
#   3. resolved sources (< chunk base) and literal ids are fetched with
#      adaptive chunk ladders over the VMEM-resident output / literal
#      buffers — the trip count follows the data's actual distance spread.

MAX_PB_B = 32                    # pages per phase-B block (VMEM budget):
                                 # the sweep is bound by per-chunk loop
                                 # overhead, so wider blocks amortize it
                                 # (16 -> 32 in round 4: byte packing made
                                 # the footprint fit; _sweep_pb still
                                 # steps down when buckets are large)


def make_phase_b_kernel_wide(S: int, nch: int, ncmdch: int, nrecch: int,
                             cbucket: int, pb: int, cw: int = 512):
    """Wide-group sweep (cw = 512 or 1024 bytes per loop iteration):
    4x/8x fewer loop iterations than the 128-byte kernel (PERF.md
    round-2 projection - the bare-chip bottleneck is per-iteration
    bookkeeping, not bytes). The group is held as [cw/128, pb, 128] so
    every gather stays lane-local (Mosaic's dynamic indexing is
    per-128-lane row); cross-subchunk reads go through a subrow
    ladder."""
    from jax.experimental import pallas as pl  # noqa: F401
    from jax.experimental.pallas import tpu as pltpu  # noqa: F401

    SUB = cw // 128
    CW = cw
    ngrp = S // CW

    def kernel(st_ref, cst_ref, lst_ref, dst_ref, chs_ref,
               lit_ref, out_ref):
        lane = jax.lax.broadcasted_iota(I32, (pb, 128), 1)
        lane3 = jax.lax.broadcasted_iota(I32, (SUB, pb, 128), 2)
        sub3 = jax.lax.broadcasted_iota(I32, (SUB, pb, 128), 0)
        ncmd_pad = ncmdch * 128
        nrec_pad = nrecch * 128

        def g2d(row, idx3):
            """Gather one [pb,128] row at [SUB,pb,128] lane indices
            (0..127) as SUB static 2D gathers — Mosaic lowers only 2D
            gather, so the broadcast-to-3D formulation does not compile."""
            return jnp.stack([jnp.take_along_axis(row, idx3[q], axis=1)
                              for q in range(SUB)], axis=0)

        def sub_ladder(rows, idx):
            """Gather rows[t][...] at idx (< len(rows)*128): subrow t =
            idx >> 7, lane = idx & 127. rows: list of [pb,128]."""
            out = jnp.zeros((SUB, pb, 128), I32)
            t_of = idx >> 7
            for t in range(len(rows)):
                g = g2d(rows[t], idx & 127)
                out = jnp.where(t_of == t, g, out)
            return out

        def chunk_body(c, carry):
            c0, lc0 = carry                      # [pb,1] per-page cursors
            base = c * CW
            pos = base + sub3 * 128 + lane3      # [SUB, pb, 128]

            # covering-command search: 256-rank window from the per-page
            # cursor + binary search, retried forward when a lane's
            # cover lies past the window (same windowed pattern as
            # lit_search below). Replaces the round-4 worst-case WIN
            # (= CW/2+1 ranks, 6 rows at cw=1024) window load + 10-step
            # ladder search: typical groups consume well under 256
            # ranks, so the common case is ONE retry round over 2 rows —
            # ~3x fewer per-group gathers (VERDICT r4 next item 1, the
            # "two-level cmd_of" lever).
            def cmd_search(carry):
                ccov, pend, t = carry
                on = pend != 0
                widx0 = jnp.clip(c0 + t * 255 + lane, 0, ncmd_pad - 1)
                widx1 = jnp.clip(c0 + t * 255 + 128 + lane, 0,
                                 ncmd_pad - 1)
                kmin = jnp.min(widx0) >> 7
                kmax = jnp.max(widx1) >> 7

                def rbody(k, acc):
                    a0, a1 = acc
                    ch = st_ref[k]
                    g0 = jnp.take_along_axis(ch, widx0 & 127, axis=1)
                    g1 = jnp.take_along_axis(ch, widx1 & 127, axis=1)
                    return (jnp.where((widx0 >> 7) == k, g0, a0),
                            jnp.where((widx1 >> 7) == k, g1, a1))

                rw0, rw1 = jax.lax.fori_loop(
                    kmin, kmax + 1, rbody,
                    (jnp.zeros((pb, 128), I32),
                     jnp.zeros((pb, 128), I32)))
                ll = jnp.zeros((SUB, pb, 128), I32)
                for step in (128, 64, 32, 16, 8, 4, 2, 1):
                    pr = ll + step
                    prc = jnp.clip(pr, 0, 255)
                    v = jnp.where(prc < 128,
                                  g2d(rw0, prc & 127),
                                  g2d(rw1, prc & 127))
                    ll = jnp.where((pr <= 255) & (v <= pos), pr, ll)
                ok = on & (ll < 255)
                ccov = jnp.where(ok, c0 + t * 255 + ll, ccov)
                return (ccov, jnp.where(ok, 0, pend), t + 1)

            zero3 = jnp.zeros((SUB, pb, 128), I32)
            # NB: named ccov, NOT cov — lit_search below rebinds `cov`
            # for its record index, and the cursor update at the end of
            # the group must see the COMMAND cover (a shadowing bug here
            # silently advanced the cursor past covers on pages whose
            # record count exceeds their command count)
            ccov, _, _ = jax.lax.while_loop(
                lambda car: jnp.max(car[1]) > 0, cmd_search,
                (zero3, jnp.ones((SUB, pb, 128), I32), jnp.int32(0)))
            ccov = jnp.clip(ccov, 0, ncmd_pad - 1)

            # fields at the covering rank: distinct 128-rank chunks only
            # (min-of-pending ladder; covers lie within the few chunks a
            # group's rank span touches)
            cwcmd = ccov >> 7
            ccl = ccov & 127

            def fbody(carry):
                st_l, cst_l, lst_l, dst_l, pend = carry
                on = pend != 0
                k = jnp.min(jnp.where(on, cwcmd, ncmdch))
                kk = jnp.clip(k, 0, ncmdch - 1)
                hit = on & (cwcmd == k)
                outs = []
                for ref, cur in ((st_ref, st_l), (cst_ref, cst_l),
                                 (lst_ref, lst_l), (dst_ref, dst_l)):
                    g = g2d(ref[kk], ccl)
                    outs.append(jnp.where(hit, g, cur))
                return (outs[0], outs[1], outs[2], outs[3],
                        jnp.where(hit, 0, pend))

            st_l, cst_l, lst_l, dst_l, _ = jax.lax.while_loop(
                lambda car: jnp.max(car[4]) > 0, fbody,
                (zero3, zero3, zero3, zero3,
                 jnp.ones((SUB, pb, 128), I32)))

            in_ins = pos < cst_l
            lit_id = jnp.clip(lst_l + (pos - st_l), 0, cbucket * 128 - 1)
            d = jnp.maximum(dst_l, 1)
            a = jnp.maximum(pos - cst_l, 0)
            q = jnp.floor(a.astype(jnp.float32)
                          / d.astype(jnp.float32)).astype(I32)
            r = a - q * d
            r = jnp.where(r < 0, r + d, r)
            r = jnp.where(r >= d, r - d, r)
            srcc = jnp.clip(cst_l - d + r, 0, S - 1)
            src = jnp.where(in_ins, S + lit_id, srcc)

            # in-group chains: log2(CW) rounds of map doubling
            for _ in range((CW - 1).bit_length()):
                off = src - base
                ingrp = (off >= 0) & (off < CW)
                nxt = sub_ladder([src[t] for t in range(SUB)],
                                 jnp.clip(off, 0, CW - 1))
                src = jnp.where(ingrp, nxt, src)

            is_lit = src >= S
            lid = jnp.where(is_lit, src - S, 0)
            byte = jnp.zeros((SUB, pb, 128), I32)

            # literal id -> slot record (windowed search, per-page cursor)
            def lit_search(carry):
                cov, start_of, pend, lc, t = carry
                on = pend != 0
                widx0 = jnp.clip(lc + t * 255 + lane, 0, nrec_pad - 1)
                widx1 = jnp.clip(lc + t * 255 + 128 + lane, 0,
                                 nrec_pad - 1)
                rkmin = jnp.min(widx0) >> 7
                rkmax = jnp.max(widx1) >> 7

                def rbody(k, acc):
                    a0, a1 = acc
                    ch = chs_ref[k]
                    g0 = jnp.take_along_axis(ch, widx0 & 127, axis=1)
                    g1 = jnp.take_along_axis(ch, widx1 & 127, axis=1)
                    return (jnp.where((widx0 >> 7) == k, g0, a0),
                            jnp.where((widx1 >> 7) == k, g1, a1))

                rw0, rw1 = jax.lax.fori_loop(
                    rkmin, rkmax + 1, rbody,
                    (jnp.zeros((pb, 128), I32),
                     jnp.zeros((pb, 128), I32)))

                ll = jnp.zeros((SUB, pb, 128), I32)
                for step in (128, 64, 32, 16, 8, 4, 2, 1):
                    pr = ll + step
                    prc = jnp.clip(pr, 0, 255)
                    v = jnp.where(prc < 128,
                                  g2d(rw0, prc & 127),
                                  g2d(rw1, prc & 127))
                    ll = jnp.where((pr <= 255) & (v <= lid), pr, ll)
                sv = jnp.where(ll < 128,
                               g2d(rw0, ll & 127),
                               g2d(rw1, jnp.clip(ll - 128, 0, 127)))
                ok = on & (ll < 255)
                cov = jnp.where(ok, lc + t * 255 + ll, cov)
                start_of = jnp.where(ok, sv, start_of)
                return (cov, start_of, jnp.where(ok, 0, pend), lc, t + 1)

            zero = jnp.zeros((SUB, pb, 128), I32)
            cov, start_of, _, _, _ = jax.lax.while_loop(
                lambda car: jnp.max(car[2]) > 0, lit_search,
                (zero, zero, is_lit.astype(I32), lc0, jnp.int32(0)))
            cov = jnp.clip(cov, 0, cbucket - 1)
            off_l = jnp.clip(lid - start_of, 0, 127)
            lc0 = jnp.max(jnp.where(is_lit, cov, lc0),
                          axis=(0, 2))[:, None]

            # literal fetch: distinct packed-slot chunks only
            cb4 = (cbucket + 3) // 4
            lwch = cov >> 2
            llane = off_l
            lbyte = (cov & 3) << 3

            def lbody(carry):
                byte, pend = carry
                on = pend != 0
                k = jnp.min(jnp.where(on, lwch, cb4))
                row = lit_ref[jnp.clip(k, 0, cb4 - 1)]
                g = (g2d(row, llane) >> lbyte) & 255
                hit = on & (lwch == k)
                return (jnp.where(hit, g, byte), jnp.where(hit, 0, pend))

            byte, _ = jax.lax.while_loop(
                lambda cr: jnp.max(cr[1]) > 0, lbody,
                (byte, is_lit.astype(I32)))

            # copy fetch from the packed output rows (512B per row —
            # independent of CW, so the sentinel/clip bound is S//512,
            # NOT ngrp: using ngrp at CW=1024 left upper-half sources
            # forever pending = an in-kernel infinite loop)
            nout = S // 512
            csel = jnp.where(is_lit, 0, jnp.clip(src, 0, S - 1))
            cwch = csel >> 9
            clane = (csel >> 2) & 127
            cbyte = (csel & 3) << 3

            def cbody(carry):
                byte, pend = carry
                on = pend != 0
                k = jnp.min(jnp.where(on, cwch, nout))
                row = out_ref[jnp.clip(k, 0, nout - 1)]
                g = (g2d(row, clane) >> cbyte) & 255
                hit = on & (cwch == k)
                return (jnp.where(hit, g, byte), jnp.where(hit, 0, pend))

            byte, _ = jax.lax.while_loop(
                lambda cr: jnp.max(cr[1]) > 0, cbody,
                (byte, (~is_lit).astype(I32)))

            # pack the group's bytes into CW/512 128-word output rows:
            # output row h, word w <- bytes 512h+4w..+3 = subrow
            # 4h + (w>>5), lanes 4*(w&31)+t
            for hrow in range(CW // 512):
                pk = jnp.zeros((pb, 128), I32)
                for si in range(4):
                    s = 4 * hrow + si
                    part = jnp.zeros((pb, 128), I32)
                    for t in range(4):
                        g = jnp.take_along_axis(
                            byte[s], jnp.clip(4 * (lane & 31) + t, 0, 127),
                            axis=1)
                        part = part | (g << (8 * t))
                    pk = jnp.where((lane >> 5) == si, part, pk)
                out_ref[pl.ds(c * (CW // 512) + hrow, 1)] = pk[None]

            return (jnp.max(ccov, axis=(0, 2))[:, None], lc0)

        jax.lax.fori_loop(0, ngrp, chunk_body,
                          (jnp.zeros((pb, 1), I32),
                           jnp.zeros((pb, 1), I32)))

    return kernel


def make_phase_b_kernel(S: int, nch: int, ncmdch: int, nrecch: int,
                        cbucket: int, pb: int):
    from jax.experimental import pallas as pl  # noqa: F401
    from jax.experimental.pallas import tpu as pltpu

    def kernel(st_ref, cst_ref, lst_ref, dst_ref, chs_ref,
               lit_ref, out_ref):
        # chs_ref [nrecch, pb, 128]: per-record literal-queue starts;
        # lit_ref [ceil(cbucket/4), pb, 128]: literal slot chunks PACKED
        #   four bytes per int32 word (little-endian);
        # out_ref [nch//4, pb, 128]: output bytes, same packing — 4x less
        #   VMEM and HBM than byte-per-word, at ~4 extra VPU ops per read.
        lane = jax.lax.broadcasted_iota(I32, (pb, 128), 1)
        ncmd_pad = ncmdch * 128

        def chunk_body(c, carry):
            c0, lc0 = carry
            base = c * 128
            pos = base + lane
            idx0 = jnp.clip(c0 + lane, 0, ncmd_pad - 1)
            idx1 = jnp.clip(c0 + 128 + lane, 0, ncmd_pad - 1)

            # windows of the 4 command fields (two 128-vectors each)
            kmin = jnp.min(idx0) >> 7
            kmax = jnp.max(idx1) >> 7

            def wbody(k, acc):
                out = []
                for ref, (a0, a1) in zip((st_ref, cst_ref, lst_ref,
                                          dst_ref), acc):
                    ch = ref[k]
                    g0 = jnp.take_along_axis(ch, idx0 & 127, axis=1)
                    g1 = jnp.take_along_axis(ch, idx1 & 127, axis=1)
                    out.append((jnp.where((idx0 >> 7) == k, g0, a0),
                                jnp.where((idx1 >> 7) == k, g1, a1)))
                return tuple(out)

            zero2 = (jnp.zeros((pb, 128), I32), jnp.zeros((pb, 128), I32))
            ((w0_st, w1_st), (w0_cst, w1_cst), (w0_lst, w1_lst),
             (w0_dst, w1_dst)) = jax.lax.fori_loop(
                kmin, kmax + 1, wbody, (zero2, zero2, zero2, zero2))

            # per-lane binary search: largest window rank with start <= pos
            lo = jnp.zeros((pb, 128), I32)
            for step in (128, 64, 32, 16, 8, 4, 2, 1):
                probe = lo + step
                pc = jnp.clip(probe, 0, 255)
                sp = jnp.where(
                    pc < 128,
                    jnp.take_along_axis(w0_st, pc & 127, axis=1),
                    jnp.take_along_axis(w1_st, pc & 127, axis=1))
                lo = jnp.where((probe <= 255) & (sp <= pos), probe, lo)
            rel = lo

            def at_rel(w0, w1):
                rc = jnp.clip(rel, 0, 255)
                return jnp.where(
                    rc < 128,
                    jnp.take_along_axis(w0, rc & 127, axis=1),
                    jnp.take_along_axis(w1, rc & 127, axis=1))

            st_l = at_rel(w0_st, w1_st)
            cst_l = at_rel(w0_cst, w1_cst)
            lst_l = at_rel(w0_lst, w1_lst)
            dst_l = at_rel(w0_dst, w1_dst)

            in_ins = pos < cst_l
            lit_id = jnp.clip(lst_l + (pos - st_l), 0,
                              cbucket * 128 - 1)
            d = jnp.maximum(dst_l, 1)
            a = jnp.maximum(pos - cst_l, 0)
            # a % d via exact f32 division (operands < 2^17) + correction
            q = jnp.floor(a.astype(jnp.float32)
                          / d.astype(jnp.float32)).astype(I32)
            r = a - q * d
            r = jnp.where(r < 0, r + d, r)
            r = jnp.where(r >= d, r - d, r)
            srcc = jnp.clip(cst_l - d + r, 0, S - 1)
            src = jnp.where(in_ins, S + lit_id, srcc)

            # in-chunk chains: 7 rounds of map doubling
            for _ in range(7):
                inchunk = (src >= base) & (src < base + 128)
                nxt = jnp.take_along_axis(
                    src, jnp.clip(src - base, 0, 127), axis=1)
                src = jnp.where(inchunk, nxt, src)

            is_lit = src >= S
            lid = jnp.where(is_lit, src - S, 0)
            byte = jnp.zeros((pb, 128), I32)

            # literal id -> slot record via a windowed binary search over
            # the sorted record starts (lids only move forward across the
            # sweep, so a per-page cursor window almost always covers; a
            # rare retry loop advances it over long literal-less spans).
            # Empty records share their start with the NEXT one and lose
            # the largest-index tie-break, so the covering record wins.
            nrec_pad = nrecch * 128

            def lit_search(carry):
                cov, start_of, pend, lc, t = carry
                on = pend != 0
                widx0 = jnp.clip(lc + t * 255 + lane, 0, nrec_pad - 1)
                widx1 = jnp.clip(lc + t * 255 + 128 + lane, 0,
                                 nrec_pad - 1)
                rkmin = jnp.min(widx0) >> 7
                rkmax = jnp.max(widx1) >> 7

                def rbody(k, acc):
                    a0, a1 = acc
                    ch = chs_ref[k]
                    g0 = jnp.take_along_axis(ch, widx0 & 127, axis=1)
                    g1 = jnp.take_along_axis(ch, widx1 & 127, axis=1)
                    return (jnp.where((widx0 >> 7) == k, g0, a0),
                            jnp.where((widx1 >> 7) == k, g1, a1))

                rw0, rw1 = jax.lax.fori_loop(
                    rkmin, rkmax + 1, rbody,
                    (jnp.zeros((pb, 128), I32), jnp.zeros((pb, 128), I32)))

                ll = jnp.zeros((pb, 128), I32)
                for step in (128, 64, 32, 16, 8, 4, 2, 1):
                    pr = ll + step
                    prc = jnp.clip(pr, 0, 255)
                    v = jnp.where(
                        prc < 128,
                        jnp.take_along_axis(rw0, prc & 127, axis=1),
                        jnp.take_along_axis(rw1, prc & 127, axis=1))
                    ll = jnp.where((pr <= 255) & (v <= lid), pr, ll)
                sv = jnp.where(
                    ll < 128, jnp.take_along_axis(rw0, ll & 127, axis=1),
                    jnp.take_along_axis(rw1, jnp.clip(ll - 128, 0, 127),
                                        axis=1))
                ok = on & (ll < 255)
                cov = jnp.where(ok, lc + t * 255 + ll, cov)
                start_of = jnp.where(ok, sv, start_of)
                return (cov, start_of, jnp.where(ok, 0, pend), lc, t + 1)

            zero = jnp.zeros((pb, 128), I32)
            cov, start_of, _, _, _ = jax.lax.while_loop(
                lambda car: jnp.max(car[2]) > 0, lit_search,
                (zero, zero, is_lit.astype(I32), lc0, jnp.int32(0)))
            cov = jnp.clip(cov, 0, cbucket - 1)
            off = jnp.clip(lid - start_of, 0, 127)
            lc0 = jnp.max(jnp.where(is_lit, cov, lc0), axis=1,
                          keepdims=True)

            # gathers iterate over the DISTINCT chunks the lanes actually
            # need (min-of-pending loop), not the [kmin, kmax] span — trip
            # count follows the data's real source spread
            # slots are packed ACROSS chunks at the same lane: word at
            # (chunk a, lane l) holds slot chunks 4a..4a+3's byte l
            cb4 = (cbucket + 3) // 4
            lwch = cov >> 2
            llane = off
            lbyte = (cov & 3) << 3

            def lbody(carry):
                byte, pend = carry           # pend: int32 0/1 mask
                on = pend != 0
                k = jnp.min(jnp.where(on, lwch, cb4))
                w_ = jnp.take_along_axis(
                    lit_ref[jnp.clip(k, 0, cb4 - 1)], llane, axis=1)
                g = (w_ >> lbyte) & 255
                hit = on & (lwch == k)
                return (jnp.where(hit, g, byte),
                        jnp.where(hit, 0, pend))

            byte, _ = jax.lax.while_loop(
                lambda c: jnp.max(c[1]) > 0, lbody,
                (byte, is_lit.astype(I32)))

            csel = jnp.where(is_lit, 0, jnp.clip(src, 0, S - 1))
            nch4 = nch // 4
            cwch = csel >> 9
            clane = (csel >> 2) & 127
            cbyte = (csel & 3) << 3

            def cbody(carry):
                byte, pend = carry
                on = pend != 0
                k = jnp.min(jnp.where(on, cwch, nch4))
                w_ = jnp.take_along_axis(
                    out_ref[jnp.clip(k, 0, nch4 - 1)], clane, axis=1)
                g = (w_ >> cbyte) & 255
                hit = on & (cwch == k)
                return (jnp.where(hit, g, byte),
                        jnp.where(hit, 0, pend))

            byte, _ = jax.lax.while_loop(
                lambda c: jnp.max(c[1]) > 0, cbody,
                (byte, (~is_lit).astype(I32)))

            # pack the chunk's 128 bytes into 32 words and store them in
            # quarter (c & 3) of output word-row c >> 2
            l32 = lane & 31
            pk = jnp.zeros((pb, 128), I32)
            for t in range(4):
                g = jnp.take_along_axis(byte, jnp.clip(4 * l32 + t, 0, 127),
                                        axis=1)
                pk = pk | (g << (8 * t))
            pk = jnp.where(lane < 32, pk, 0)
            q = c & 3
            pkq = jnp.where(
                q == 0, pk,
                jnp.where(q == 1, pltpu.roll(pk, 32, 1),
                          jnp.where(q == 2, pltpu.roll(pk, 64, 1),
                                    pltpu.roll(pk, 96, 1))))
            row = out_ref[c >> 2]
            out_ref[pl.ds(c >> 2, 1)] = jnp.where(
                (lane >> 5) == q, pkq, row)[None]
            return (jnp.max(c0 + rel, axis=1, keepdims=True), lc0)

        jax.lax.fori_loop(0, nch, chunk_body,
                          (jnp.zeros((pb, 1), I32),
                           jnp.zeros((pb, 1), I32)))

    return kernel


def _to_chunk_major(x, nchunks: int, pad_val: int = 0):
    """[P, W] -> [ceil(W/128) chunks, P, 128] (chunk-major for dynamic
    first-dim indexing in the kernel)."""
    P, W = x.shape
    pad = nchunks * 128 - W
    if pad:
        x = jnp.pad(x, ((0, 0), (0, pad)), constant_values=pad_val)
    return x.reshape(P, nchunks, 128).transpose(1, 0, 2)


@partial(jax.jit, static_argnums=(7, 8, 9))
def phase_b_pallas(ncmds, litbuf, ins_a, cpy_a, dcode_a, dextra_a, npd,
                   page_size: int, interpret: bool = False,
                   sweep_cw: int = 128):
    """Phase B over an already-compacted literal buffer: identity slot
    records (slot j starts at literal 128j)."""
    P = litbuf.shape[0]
    lch = (litbuf.shape[1] + 127) // 128
    slots4 = _pack_slots(_to_chunk_major(litbuf.astype(I32), lch))
    recs = jnp.broadcast_to(
        (jnp.arange(lch, dtype=I32) * 128)[None, :], (P, lch))
    return _phase_b_sweep(ncmds, slots4, lch, recs, ins_a, cpy_a, dcode_a,
                          dextra_a, npd, page_size, interpret,
                          sweep_cw=sweep_cw)


def _pack_slots(slots):
    """[CB, P, 128] byte slots -> [ceil(CB/4), P, 128] packed words
    (byte q of a word = slot chunk 4a+q at the same lane)."""
    cb = slots.shape[0]
    pad4 = -cb % 4
    if pad4:
        slots = jnp.concatenate(
            [slots, jnp.zeros((pad4,) + slots.shape[1:], slots.dtype)],
            axis=0)
    return (slots[0::4] | (slots[1::4] << 8) | (slots[2::4] << 16)
            | (slots[3::4] << 24))


def _sweep_pb(P: int, cb4: int, N: int, S: int) -> int:
    """Pages per phase-B block: the biggest pb whose VMEM footprint
    (slots + packed out + command planes, double-buffered inputs) fits
    ~13MB of the 16MB scoped budget."""
    words_per_page = (2 * cb4 * 128            # packed slots, x2 buffers
                      + 2 * (S // 512) * 128   # packed out blocks
                      + 8 * ((N + 127) // 128) * 128
                      + 2 * ((cb4 * 4 + 127) // 128) * 128)
    pb = MAX_PB_B
    while pb > 1 and (pb * words_per_page * 4 > 13 * (1 << 20) or P % pb):
        pb -= 1
    return pb


def _phase_b_sweep(ncmds, slots4, cbucket, recs, ins_a, cpy_a, dcode_a,
                   dextra_a, npd, page_size: int, interpret: bool = False,
                   resolved: bool = False, sweep_cw: int = 128):
    """Masked command prep + distance resolution (XLA, unless the phase-A
    kernel already resolved the ring: resolved=True means dcode_a holds
    absolute distances) + the chunk-sweep LZ kernel.

    slots: [CB, P, 128] literal slot chunks (raw phase-A output order);
    recs:  [P, CB] literal-queue start of each slot (sorted per page).
    Returns out [P, page_size] uint8."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from .decode import _resolve_distances

    P, N = ins_a.shape
    S = page_size
    pb = _sweep_pb(P, slots4.shape[0], N, S)
    cid = jnp.arange(N, dtype=I32)[None, :]
    valid = cid < ncmds[:, None]
    ins_m = jnp.where(valid, ins_a, 0)
    cpy_m = jnp.where(valid, cpy_a, 0)
    if resolved:
        dist = jnp.where(valid, dcode_a, 0)
    else:
        dist = _resolve_distances(ins_m, cpy_m, dcode_a, dextra_a, ncmds,
                                  npd[:, 0], npd[:, 1], N)
    cov = ins_m + cpy_m
    st = jnp.cumsum(cov, axis=1) - cov
    cst = st + ins_m
    lst = jnp.cumsum(ins_m, axis=1) - ins_m
    # invalid commands must never win the binary search
    st = jnp.where(valid, st, jnp.int32(1) << 29)

    ncmdch = (N + 127) // 128
    nch = S // 128
    cb4 = slots4.shape[0]
    nrecch = (cbucket + 127) // 128
    st3 = _to_chunk_major(st, ncmdch, pad_val=1 << 29)
    cst3 = _to_chunk_major(cst, ncmdch)
    lst3 = _to_chunk_major(lst, ncmdch)
    dst3 = _to_chunk_major(dist, ncmdch)
    recs3 = _to_chunk_major(recs, nrecch, pad_val=1 << 29)

    # the wide-group kernel is the hardware-validated default
    # (byte-identical to the narrow kernel, -34% batch time same-window
    # at cw=512, 2026-08-18); sweep_cw=128 selects the narrow kernel as
    # fallback, 1024 the double-wide round-4 variant. sweep_cw is a
    # per-call static arg so bench.py can A/B it at runtime
    if sweep_cw in (512, 1024, 2048) and S % sweep_cw == 0:
        kernel = make_phase_b_kernel_wide(S, nch, ncmdch, nrecch,
                                          cbucket, pb, sweep_cw)
    else:
        kernel = make_phase_b_kernel(S, nch, ncmdch, nrecch, cbucket, pb)

    def vspec(shape, imap):
        return pl.BlockSpec(shape, imap, memory_space=pltpu.VMEM)

    def cm_spec(ncsh):
        return vspec((ncsh, pb, 128), lambda i: (0, i, 0))

    out = pl.pallas_call(
        kernel,
        grid=(P // pb,),
        out_shape=jax.ShapeDtypeStruct((nch // 4, P, 128), jnp.int32),
        in_specs=[cm_spec(ncmdch)] * 4
        + [cm_spec(nrecch), cm_spec(cb4)],
        out_specs=cm_spec(nch // 4),
        interpret=interpret,
    )(st3, cst3, lst3, dst3, recs3, slots4)
    w = out.transpose(1, 0, 2).reshape(P, (nch // 4) * 128)
    b = jax.lax.bitcast_convert_type(w, jnp.uint8)    # [P, S//4, 4] LE
    return b.reshape(P, nch * 128)[:, :S]


# ---------------------------------------------------------------------------
# Fused decode: phase A + phase B in ONE kernel dispatch
# ---------------------------------------------------------------------------
#
# The reference GPU decoder never leaves the chip between symbol decode and
# LZ execution (BrotliGCompute.hlsl:1349-1432: commands, literals and the
# output page all live in registers/LDS). The two-phase pipeline above pays
# for that split three times: phase A DMAs command rounds + literal rows to
# HBM, an XLA middle stage re-reads them (transposes + cumsums + chunk-major
# relayouts), and the host fetches `stats` between the dispatches to size
# the phase-B buckets. The fused kernel keeps everything in VMEM scratch:
#
# * the round loop writes the four command fields straight into chunk-major
#   planes ([ncmdch, pb, 128]: command n at (n>>7, page, n&127)) with the
#   output start / copy start / literal start computed on the fly from
#   32-lane prefix sums + running totals — exactly the cumsums the XLA
#   middle stage computed over HBM arrays;
# * literal slot rows and their start records accumulate in scratch planes
#   with the same packing the phase-B sweep expects;
# * the phase-B kernel BODY (make_phase_b_kernel / _wide) then runs in the
#   same kernel invocation on those scratch refs — scratch and input refs
#   share the load interface, so the sweep code is reused verbatim.
#
# VMEM sizing note: at 64 KiB pages the worst-case command planes
# (max_cmds = S/2 len-2 copies) cost 4*257 rows, the packed literal plane
# ~769 rows, the interleaved bitstream ~144 rows — pb=8 pages/block fits
# the ~13 MB scoped budget with the full worst-case bounds (see _fused_pb).

BIG_START = 1 << 29      # "never wins the covering-command search"


def _fused_chunks(page_size: int, max_cmds: int, lit_mult: int = 4) -> int:
    """Literal-chunk capacity bound (identical to phase A's).

    lit_mult scales the lockstep-overshoot slack on the all-literals term
    (chunk slots are consumed at the block-max rate, so unbalanced blocks
    need headroom): 4 is the proven-safe worst-case bound; the tight
    bucket uses 2 and relies on the stats-checked rerun fallback."""
    return max_cmds // NBS + lit_mult * ((page_size + 64) // CHUNK_W) + 2


def default_mc_bucket(page_size: int, max_cmds: int) -> int:
    """The safe default command-plane bucket: page_size/4 commands (avg
    covered length < 4 B/cmd only on near-incompressible data, which the
    encoders store raw)."""
    return min(max_cmds, max((page_size // 4 + 127) // 128 * 128, 2048))


def mc_bucket_for(page_size: int, max_cmds: int, peak_cmds: int) -> int:
    """Bucket a host-known command-count hint (e.g. the previous batch's
    observed peak, or a warmup run's) to a bounded ladder of compiled
    variants: powers of two from 2048 up to the page_size/4 default.

    Smaller buckets shrink the fused kernel's dominant VMEM term (the
    four command planes) so _fused_pb fits more pages per block, which
    directly divides the lockstep round-loop and sweep iteration counts
    (VERDICT r4 next item 1). An undershot hint is caught by the stats
    overflow check and rerun — degrade, never corrupt."""
    top = default_mc_bucket(page_size, max_cmds)
    b = 2048
    while b < min(peak_cmds, top):
        b *= 2
    return min(b, top)


def ch_bucket_for(page_size: int, max_cmds: int, peak_chunks: int) -> int:
    """Bucket a host-known literal-chunk-count hint (the kernel stats'
    chunk peak) to powers of two — the literal plane is the other large
    VMEM term next to the command planes."""
    top = _fused_chunks(page_size, default_mc_bucket(page_size, max_cmds),
                        lit_mult=2)
    b = 256
    while b < min(peak_chunks, top):
        b *= 2
    return min(b, top)


def fused_bounds(page_size: int, max_cmds: int, mc_bucket: int,
                 ch_bucket: int = 0):
    """(command bound, literal-chunk capacity) for the fused kernel.

    mc_bucket > 0 buckets the command planes at that many commands and
    halves the literal-chunk slack; ch_bucket > 0 additionally buckets
    the literal-chunk capacity (the other dominant VMEM term). Smaller
    bounds let _fused_pb fit more pages per block, dividing the lockstep
    round-loop iteration count. Overflow is detected from the kernel's
    stats output (rounds used == R, or chunk count at capacity) and the
    batch reruns with the full bounds — the same degrade-don't-corrupt
    pattern as the literal-chunk fallback. mc_bucket == 0 = full
    worst-case bounds (ch_bucket is ignored then)."""
    if not mc_bucket:
        return max_cmds, _fused_chunks(page_size, max_cmds)
    mc = min(max_cmds, max((mc_bucket + 127) // 128 * 128, 2048))
    chunks = _fused_chunks(page_size, mc, lit_mult=2)
    if ch_bucket:
        chunks = min(chunks, max(ch_bucket, 64))
    return mc, chunks


def make_fused_kernel(page_size: int, max_cmds: int, wc: int, pb: int,
                      sweep_cw: int, max_chunks: int | None = None):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    S = page_size
    R = max_cmds // NBS
    if max_chunks is None:
        max_chunks = _fused_chunks(page_size, max_cmds)
    ncmdch = (max_cmds + 127) // 128
    nrecch = (max_chunks + 127) // 128
    cb4 = (max_chunks + 3) // 4
    nch = S // 128
    maxc1 = max_chunks - 1

    if sweep_cw in (512, 1024, 2048) and S % sweep_cw == 0:
        sweep = make_phase_b_kernel_wide(S, nch, ncmdch, nrecch,
                                         max_chunks, pb, sweep_cw)
    else:
        sweep = make_phase_b_kernel(S, nch, ncmdch, nrecch, max_chunks, pb)

    def kernel(buf_ref, bp0_ref, npd_ref,
               icp_lim, icp_first, icp_off, icp_triv, icp_dict,
               dst_lim, dst_first, dst_off, dst_triv, dst_dict,
               lit_lim, lit_first, lit_off, lit_triv, lit_dict,
               out_ref, ncmds_out, stats_out,
               st_pl, cst_pl, lst_pl, dst_pl, recs_pl, lit_pl):
        L = _LaneOps(pb)
        lane, s_of, j_of = L.lane, L.s_of, L.j_of
        bcast_slots = L.bcast_slots
        fetch6 = L.mk_fetch6(buf_ref, wc)
        extract = L.extract
        decode_sym = L.decode_sym

        npf = npd_ref[:, 0:1]
        ndir = npd_ref[:, 1:2]

        # unwritten command starts / record starts must never win their
        # binary searches
        def init_body(i, _):
            @pl.when(i < ncmdch)
            def _():
                st_pl[pl.ds(i, 1)] = jnp.full((1, pb, 128), BIG_START, I32)
                cst_pl[pl.ds(i, 1)] = jnp.zeros((1, pb, 128), I32)
                lst_pl[pl.ds(i, 1)] = jnp.zeros((1, pb, 128), I32)
                dst_pl[pl.ds(i, 1)] = jnp.zeros((1, pb, 128), I32)

            @pl.when(i < nrecch)
            def _():
                recs_pl[pl.ds(i, 1)] = jnp.full((1, pb, 128), BIG_START,
                                                I32)
            return 0

        jax.lax.fori_loop(0, max(ncmdch, nrecch), init_body, 0)

        def place(v, q):
            """Move lanes 0..31 to the 32-lane slot group q (dynamic)."""
            return jnp.where(q == 0, v,
                             jnp.where(q == 1, pltpu.roll(v, 32, 1),
                                       jnp.where(q == 2,
                                                 pltpu.roll(v, 64, 1),
                                                 pltpu.roll(v, 96, 1))))

        def plane_write(plane, v, chunk, q):
            row = plane[chunk]
            plane[pl.ds(chunk, 1)] = jnp.where(
                (lane >> 5) == q, place(v, q), row)[None]

        # ---- literal chunks (plane-sink twin of phase A's lit_chunk) ----
        def lit_block(w, sh, delta, lbase, rlit):
            """Decode one 128-literal chunk from an already-fetched
            window, chaining the bit-consumption prefix `delta`."""
            block = jnp.zeros((pb, 128), I32)
            for jj in range(LSLOTS):
                win15 = extract(w, sh, delta, 15)
                sym, ln = decode_sym(win15, lit_lim, lit_first, lit_off,
                                     lit_triv, lit_dict, NC_LIT)
                active = ((lbase + jj * NBS + s_of) < rlit) & (lane < NBS)
                delta = delta + jnp.where(active, ln, 0)
                placed = pltpu.roll(jnp.where(lane < NBS, sym, 0),
                                    32 * jj, 1) if jj else \
                    jnp.where(lane < NBS, sym, 0)
                block = jnp.where(j_of == jj, placed, block)
                delta = bcast_slots(delta)
            return block, delta

        def emit_chunk(block, cidx, qtail, lbase, rlit, pk):
            cw = jnp.minimum(cidx, maxc1)
            q = cidx & 3
            pk = jnp.where(q == 0, block, pk | (block << (q * 8)))

            @pl.when(q == 3)
            def _():
                lit_pl[pl.ds(jnp.minimum(cidx >> 2, cb4 - 1), 1)] = pk[None]

            start = qtail + jnp.minimum(lbase, rlit)    # [pb, 1]
            row = recs_pl[cw >> 7]
            recs_pl[pl.ds(cw >> 7, 1)] = jnp.where(
                lane == (cw & 127), jnp.broadcast_to(start, (pb, 128)),
                row)[None]
            return pk

        def lit_chunk(lbase, bp, cidx, qtail, rlit, pk):
            w = fetch6(bp)
            sh = bcast_slots(bp & 31)
            block, delta = lit_block(w, sh, jnp.zeros((pb, 128), I32),
                                     lbase, rlit)
            bp = bp + jnp.where(lane < NBS, delta, 0)
            pk = emit_chunk(block, cidx, qtail, lbase, rlit, pk)
            return bp, cidx + 1, pk

        def lit_chunk_pair(lbase, bp, cidx, qtail, rlit, pk):
            """TWO chunks per window fetch: 8 batches consume <= 151 of
            the 192-bit hold, so the loop's fetch6 + scalar sync are
            amortized over 256 literals (round 5: literal loop trips
            were ~79% of phase-A iterations on the bench corpus)."""
            w = fetch6(bp)
            sh = bcast_slots(bp & 31)
            delta = jnp.zeros((pb, 128), I32)
            block, delta = lit_block(w, sh, delta, lbase, rlit)
            pk = emit_chunk(block, cidx, qtail, lbase, rlit, pk)
            block, delta = lit_block(w, sh, delta, lbase + CHUNK_W, rlit)
            pk = emit_chunk(block, cidx + 1, qtail, lbase + CHUNK_W,
                            rlit, pk)
            bp = bp + jnp.where(lane < NBS, delta, 0)
            return bp, cidx + 2, pk

        # ---- command round (plane-sink twin of phase A's round_body) ----
        def round_body(carry):
            (r, cidx, bp, done, ncmds, prev_tail, qtail, pos_tot, ins_tot,
             rin0, rin1, rin2, rin3, pk) = carry
            active = (done == 0)                       # [pb, 1]

            w = fetch6(bp)
            sh = bcast_slots(bp & 31)
            win15 = extract(w, sh, 0, 15)
            sym, ln = decode_sym(win15, icp_lim, icp_first, icp_off,
                                 icp_triv, icp_dict, NC_ICP)
            is_norm = sym < C.NUM_COMMAND_SYMBOLS
            is_sent = sym == C.SENTINEL_COMMAND
            (ins_bits, ins_base, cpy_bits, cpy_base,
             _, _) = L.decode_cmd_fields(sym)

            ins_extra = extract(w, sh, ln, ins_bits)
            cpy_extra = extract(w, sh, ln + ins_bits, cpy_bits)
            insert_len = ins_base + ins_extra
            copy_len = cpy_base + cpy_extra
            bp1 = bp + ln
            d_off = ln + ins_bits + cpy_bits

            need_dist = is_norm & (sym >= 128)
            dwin = extract(w, sh, d_off, 15)
            dsym, dln = decode_sym(dwin, dst_lim, dst_first, dst_off,
                                   dst_triv, dst_dict, NC_DST)
            dln_eff = jnp.where(need_dist, dln, 0)
            is_long = dsym >= (16 + ndir)
            dnb = jnp.where(need_dist & is_long,
                            1 + (jnp.maximum(dsym - ndir - 16, 0)
                                 >> (npf + 1)), 0)
            dnb = jnp.clip(dnb, 0, 30)
            dextra = extract(w, sh, d_off + dln_eff, dnb)
            bp4 = bp + d_off + dln_eff + dnb

            sent_lane = jnp.where(is_sent & (lane < NBS), lane, NBS)
            k = jnp.min(sent_lane, axis=1, keepdims=True)     # [pb, 1]
            k = jnp.where(active, k, 0)
            valid = active & (lane < k)
            bp = jnp.where(valid, bp4,
                           jnp.where(active & (lane == k), bp1, bp))

            insert_len = jnp.where(valid, insert_len, 0)
            copy_len = jnp.where(valid, copy_len, 0)
            dcode = jnp.where(valid & need_dist, dsym,
                              jnp.where(valid & is_norm, 0, -1))
            dextra = jnp.where(valid, dextra, 0)

            dist, rin_n = L.resolve_ring(dcode, dextra, npf, ndir,
                                         [rin0, rin1, rin2, rin3], active)
            rin0_n, rin1_n, rin2_n, rin3_n = rin_n

            # the XLA middle stage's cumsums, computed in-round: output
            # start / copy start / literal start of each command from
            # 32-lane exclusive prefixes + the carried page totals
            cov = insert_len + copy_len
            excl_cov = L.prefix32_excl(cov)
            excl_ins = L.prefix32_excl(insert_len)
            st_v = jnp.where(valid, pos_tot + excl_cov, BIG_START)
            cst_v = pos_tot + excl_cov + insert_len
            lst_v = ins_tot + excl_ins
            chunk = r >> 2
            q = r & 3
            plane_write(st_pl, st_v, chunk, q)
            plane_write(cst_pl, cst_v, chunk, q)
            plane_write(lst_pl, lst_v, chunk, q)
            plane_write(dst_pl, dist, chunk, q)
            pos_tot = pos_tot + jnp.sum(cov, axis=1, keepdims=True)
            ins_tot = ins_tot + jnp.sum(insert_len, axis=1, keepdims=True)

            ncmds = ncmds + jnp.where(active, k, 0)

            litcount = jnp.sum(insert_len, axis=1, keepdims=True)
            bs = k
            aclit = jnp.maximum(litcount - prev_tail, 0)
            mult = jnp.where(bs > 0, (aclit + bs - 1)
                             // jnp.maximum(bs, 1), 0)
            rlit = jnp.where(active, bs * mult, 0)               # [pb, 1]
            prev_tail = jnp.where(active, rlit + prev_tail - litcount,
                                  prev_tail)

            bp, cidx, pk = lit_chunk(jnp.int32(0), bp, cidx, qtail, rlit,
                                     pk)

            def lit_cond(c):
                lbase, *_ = c
                return lbase < jnp.max(rlit)

            def lit_body(c):
                lbase, bp, cidx, pk = c
                bp, cidx, pk = lit_chunk_pair(lbase, bp, cidx, qtail,
                                              rlit, pk)
                return lbase + 2 * CHUNK_W, bp, cidx, pk

            _, bp, cidx, pk = jax.lax.while_loop(
                lit_cond, lit_body, (jnp.int32(CHUNK_W), bp, cidx, pk))
            qtail = qtail + rlit

            done = jnp.where(active & (k < NBS), 1, done)
            return (r + 1, cidx, bp, done, ncmds, prev_tail, qtail,
                    pos_tot, ins_tot, rin0_n, rin1_n, rin2_n, rin3_n, pk)

        def round_cond(carry):
            r, _, _, done, *_ = carry
            return (jnp.min(done) == 0) & (r < R)

        init = (jnp.int32(0), jnp.int32(0), bp0_ref[:],
                jnp.zeros((pb, 1), I32), jnp.zeros((pb, 1), I32),
                jnp.zeros((pb, 1), I32), jnp.zeros((pb, 1), I32),
                jnp.zeros((pb, 1), I32), jnp.zeros((pb, 1), I32),
                jnp.full((pb, 1), 4, I32), jnp.full((pb, 1), 11, I32),
                jnp.full((pb, 1), 15, I32), jnp.full((pb, 1), 16, I32),
                jnp.zeros((pb, 128), I32))
        (r_f, cidx_f, _, _, ncmds, _pt, _qt, _pos, _ins, _r0, _r1, _r2,
         _r3, pk_f) = jax.lax.while_loop(round_cond, round_body, init)

        @pl.when((cidx_f & 3) != 0)       # flush a partial packed row
        def _():
            lit_pl[pl.ds(jnp.minimum(cidx_f >> 2, cb4 - 1), 1)] = pk_f[None]

        ncmds_out[:, 0:1] = ncmds
        stats_out[:, 0:1] = jnp.broadcast_to(cidx_f, (pb, 1))
        stats_out[:, 1:2] = jnp.broadcast_to(r_f, (pb, 1))

        # ---- phase B on the scratch planes, same kernel invocation ----
        sweep(st_pl, cst_pl, lst_pl, dst_pl, recs_pl, lit_pl, out_ref)

    return kernel


def _fused_pb(P: int, wc: int, page_size: int, max_cmds: int,
              max_chunks: int | None = None) -> int:
    """Pages per fused-kernel block under the ~13 MB VMEM budget.

    Bigger blocks amortize the lockstep round loop's fixed per-iteration
    cost (scalar control + the fetch6 ladder) over more pages: the grid
    runs blocks sequentially, so total iterations = sum over blocks of
    the block-max round count."""
    if max_chunks is None:
        max_chunks = _fused_chunks(page_size, max_cmds)
    ncmdch = (max_cmds + 127) // 128
    nrecch = (max_chunks + 127) // 128
    cb4 = (max_chunks + 3) // 4
    nch = page_size // 128
    wpp = (2 * wc * 128 + 4 * ncmdch * 128 + cb4 * 128 + nrecch * 128
           + (nch // 4) * 128 + 2 * (NC_ICP + NC_DST + NC_LIT) * 128
           # 3 tables x (lim/first/off + triv), double-buffered like the
           # other pipelined inputs (ADVICE r4)
           + 2 * 3 * 4 * 128 + 1024)
    pb = min(32, P)
    while pb > 1 and (pb * wpp * 4 > 13 * (1 << 20) or P % pb):
        pb -= 1
    return pb


@partial(jax.jit, static_argnums=(2, 3, 4, 5, 6, 7, 8))
def decode_fused_pallas(words: jnp.ndarray, in_sizes: jnp.ndarray,
                        page_size: int, max_cmds: int, wl: int,
                        interpret: bool = False, sweep_cw: int = 128,
                        mc_bucket: int = 0, ch_bucket: int = 0):
    """Headers in XLA, tables on-chip, then ONE fused Pallas kernel for
    the whole page decode (phase A + phase B). Returns (out
    [P, page_size] uint8, isdelta [P], ncmds [P], stats [P, 2]).

    mc_bucket > 0 runs with bucketed command/chunk bounds (fused_bounds):
    more pages per block; the caller MUST check stats for overflow and
    rerun with mc_bucket=0 (decode.py::_finish_fused_state does)."""
    buf3, npostfix, ndirect, isdelta = \
        _parse_and_interleave(words, in_sizes, wl)
    return decode_fused_from_buf(buf3, npostfix, ndirect, isdelta,
                                 page_size, max_cmds, interpret, sweep_cw,
                                 mc_bucket, ch_bucket)


@partial(jax.jit, static_argnums=(4, 5, 6, 7, 8, 9))
def decode_fused_from_buf(buf3: jnp.ndarray, npostfix, ndirect, isdelta,
                          page_size: int, max_cmds: int,
                          interpret: bool = False, sweep_cw: int = 128,
                          mc_bucket: int = 0, ch_bucket: int = 0):
    """Fused decode from an already-interleaved buffer (host-staged via
    native.stage_pages or _parse_and_interleave): on-chip table load +
    the fused phase A+B kernel."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    P = buf3.shape[1]
    bp_local, tabs = _tables_from_buf(buf3, interpret)
    (icp_s, icp_triv), (dst_s, dst_triv), (lit_s, lit_triv) = tabs
    wc = buf3.shape[0]
    bp0 = jnp.pad(bp_local, ((0, 0), (0, 128 - NBS)))
    npd = jnp.stack([npostfix, ndirect], axis=1)

    max_cmds, max_chunks = fused_bounds(page_size, max_cmds, mc_bucket,
                                        ch_bucket)
    pb = _fused_pb(P, wc, page_size, max_cmds, max_chunks)
    ncmdch = (max_cmds + 127) // 128
    nrecch = (max_chunks + 127) // 128
    cb4 = (max_chunks + 3) // 4
    nch = page_size // 128

    kernel = make_fused_kernel(page_size, max_cmds, wc, pb, sweep_cw,
                               max_chunks)

    def vspec(shape, imap):
        return pl.BlockSpec(shape, imap, memory_space=pltpu.VMEM)

    def page_spec(cols):
        return vspec((pb, cols), lambda i: (i, 0))

    def dict_spec(nc):
        return vspec((nc, pb, 128), lambda i: (0, i, 0))

    in_specs = [
        vspec((wc, pb, 128), lambda i: (0, i, 0)),    # buf3
        page_spec(128),                               # bp0 (padded)
        page_spec(2),                                 # npd
    ]
    for nc in (NC_ICP, NC_DST, NC_LIT):
        in_specs += [page_spec(128), page_spec(128), page_spec(128),
                     page_spec(1), dict_spec(nc)]

    out_shape = (
        jax.ShapeDtypeStruct((nch // 4, P, 128), jnp.int32),  # packed out
        jax.ShapeDtypeStruct((P, 1), jnp.int32),              # ncmds
        jax.ShapeDtypeStruct((P, 2), jnp.int32),              # stats
    )
    out_specs = (
        vspec((nch // 4, pb, 128), lambda i: (0, i, 0)),
        vspec((pb, 1), lambda i: (i, 0)),
        vspec((pb, 2), lambda i: (i, 0)),
    )

    out, ncmds, stats = pl.pallas_call(
        kernel,
        grid=(P // pb,),
        out_shape=out_shape,
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=[
            pltpu.VMEM((ncmdch, pb, 128), jnp.int32),   # st plane
            pltpu.VMEM((ncmdch, pb, 128), jnp.int32),   # cst plane
            pltpu.VMEM((ncmdch, pb, 128), jnp.int32),   # lst plane
            pltpu.VMEM((ncmdch, pb, 128), jnp.int32),   # dist plane
            pltpu.VMEM((nrecch, pb, 128), jnp.int32),   # record starts
            pltpu.VMEM((cb4, pb, 128), jnp.int32),      # packed literals
        ],
        interpret=interpret,
    )(buf3, bp0, npd,
      icp_s[0], icp_s[1], icp_s[2], icp_triv[:, None], icp_s[3],
      dst_s[0], dst_s[1], dst_s[2], dst_triv[:, None], dst_s[3],
      lit_s[0], lit_s[1], lit_s[2], lit_triv[:, None], lit_s[3])

    w = out.transpose(1, 0, 2).reshape(P, (nch // 4) * 128)
    b = jax.lax.bitcast_convert_type(w, jnp.uint8)    # [P, S//4, 4] LE
    return (b.reshape(P, nch * 128)[:, :page_size],
            isdelta, ncmds[:, 0], stats)


# ---------------------------------------------------------------------------
# Host-side hints
# ---------------------------------------------------------------------------

def stream_words_hint(page_blobs) -> int:
    """Max per-stream word count over compressed pages (host-side parse of
    the self-describing size table; mirrors parse_page_headers).

    Items are either a full page blob, or ``(prefix, total_size)`` where
    prefix holds at least the page header + size table (the field widths
    derive from the page's TOTAL compressed size, so a bare truncated
    prefix would be misparsed)."""
    best = 1
    for item in page_blobs:
        if isinstance(item, tuple):
            blob, n = item
        else:
            blob, n = item, len(item)
        if n < 5:
            continue
        bits = int.from_bytes(blob[:16].ljust(16, b"\0"), "little")
        r_avg = (n + NBS - 1) // NBS
        base_bits = r_avg.bit_length()
        dlt_bits_bits = ((n - 1).bit_length()).bit_length()
        base = (bits >> 8) & ((1 << base_bits) - 1)
        dlt_bits = (bits >> (8 + base_bits)) & ((1 << dlt_bits_bits) - 1)
        if dlt_bits == 0:
            maxlen = base
        elif (8 + base_bits + dlt_bits_bits + NBS * dlt_bits + 7) // 8 \
                > len(blob):
            maxlen = n          # prefix too short: conservative bound
        else:
            pos = 8 + base_bits + dlt_bits_bits
            need = (pos + NBS * dlt_bits + 7) // 8
            big = int.from_bytes(blob[:need].ljust(need, b"\0"), "little")
            mx = 0
            for s in range(NBS):
                d = (big >> (pos + s * dlt_bits)) & ((1 << dlt_bits) - 1)
                if d > mx:
                    mx = d
            maxlen = base + mx
        wlen = maxlen // 4 + 2
        if wlen > best:
            best = wlen
    return best


def wl_bucket(wl: int) -> int:
    """Round the per-stream word capacity up to a bucket (bounds the
    number of compiled kernel variants): powers of two to 256, then
    multiples of 64 (the interleave buffer is the biggest VMEM consumer,
    so coarse buckets above 256 would waste the budget)."""
    b = 32
    while b < min(wl, 256):
        b *= 2
    while b < wl:
        b += 64
    return b


