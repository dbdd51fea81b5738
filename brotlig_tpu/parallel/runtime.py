"""Multi-archive / multi-host decode orchestration.

BASELINE configs 4 and 5: a multi-GB bundle on one chip/host (chunked,
pipelined page batches — ops/decode.decode_stream_jax) and a many-archive
stream sharded across N>=2 hosts with ordered gather.

Multi-host model (jax.distributed): archives are statically interleaved
across processes (archive i -> process i % nprocs, the deterministic
schedule that replaces the reference's atomic work queue per SURVEY §5.8);
each process decodes its subset on its local devices; the ordered gather is
by construction — every output keeps its archive index. Cross-host traffic
is zero for the codec itself (pages are independent); only the optional
final concatenation over DCN/ICI uses `multihost_utils.process_allgather`.
On this single-host machine the same code path runs with nprocs=1; the
scaling test shards over the virtual CPU mesh instead.
"""
from __future__ import annotations

from typing import Iterable, Sequence

import numpy as np

import jax

from ..format import constants as C
from ..ops.decode import decode_stream_jax


def process_info():
    try:
        return jax.process_index(), jax.process_count()
    except Exception:
        return 0, 1


def my_archive_indices(n_archives: int, process=None) -> list[int]:
    """Static interleaved assignment of archives to this process.

    `process=(pid, nprocs)` overrides auto-detection (jax.distributed is
    not available under every launcher; an MPI-style runner passes its own
    identity)."""
    pid, nproc = process if process is not None else process_info()
    return list(range(pid, n_archives, nproc))


def decode_archives(blobs: Sequence[bytes],
                    batch_pages: int = 256,
                    process=None) -> dict[int, bytes]:
    """Decode this process's share of `blobs`.

    Returns {archive_index: decompressed bytes} for locally-owned archives;
    with one process this is every archive, in order. For the full
    multi-host gather, callers either write per-archive outputs to shared
    storage keyed by index (the intended 100 GB flow — no inter-host
    traffic) or all-gather small results.
    """
    out: dict[int, bytes] = {}
    for i in my_archive_indices(len(blobs), process):
        out[i] = decode_stream_jax(blobs[i], batch_pages=batch_pages)
    return out


def decode_archives_gather(blobs: Sequence[bytes],
                           batch_pages: int = 256,
                           process=None) -> list[bytes]:
    """Decode the local share, then all-gather so EVERY process holds all
    outputs in archive order.

    The cross-host step is one `multihost_utils.process_allgather` over a
    [n_archives, max_out] uint8 plane: processes own disjoint rows (the
    static interleave), so OR-reducing the gathered copies assembles the
    ordered result — the multi-host analog of the reference's shared
    output buffer + atomic work queue (BrotligDecoder.cpp:296-329).
    Requires jax.distributed to be initialized (or nprocs == 1, where it
    degrades to a local decode)."""
    from ..format.headers import StreamHeader

    local = decode_archives(blobs, batch_pages, process)
    pid, nproc = process if process is not None else process_info()
    out_sizes = [StreamHeader.unpack(b).uncompressed_size for b in blobs]
    if nproc == 1:
        return [local[i] for i in range(len(blobs))]

    import jax.numpy as jnp
    from jax.experimental import multihost_utils

    n = len(blobs)
    maxlen = max(out_sizes) if out_sizes else 0
    buf = np.zeros((n, max(maxlen, 1)), np.uint8)
    for i, data in local.items():
        buf[i, : len(data)] = np.frombuffer(data, np.uint8)
    g = multihost_utils.process_allgather(jnp.asarray(buf))
    full = np.bitwise_or.reduce(np.asarray(g), axis=0)
    return [full[i, : out_sizes[i]].tobytes() for i in range(n)]


def decode_archives_batched(blobs: Sequence[bytes],
                            batch_pages: int = 256) -> list[bytes]:
    """Decode MANY containers in shared device batches.

    The reference GPU decoder drains a meta buffer listing thousands of
    independent streams in one dispatch (BrotliGCompute.hlsl:1755-1882,
    SURVEY §2.12.4); here pages from all archives are pooled into the same
    fixed-size device batches regardless of archive boundaries, so small
    archives amortize like big ones. Outputs keep archive order.
    """
    from ..format.headers import StreamHeader, PreconditionHeader, \
        unpack_page_table
    from ..format.precondition import DataConditionParams
    from ..ops.decode import decode_pages, max_cmds_for, _batch_pages
    from ..ops.precondition import postprocess_device
    import jax.numpy as jnp

    outs: list[bytearray] = []
    metas = []
    # job = (archive, page_index, payload_off, size, out_size)
    jobs_by_psize: dict[int, list] = {}
    for ai, blob in enumerate(blobs):
        header = StreamHeader.unpack(blob)
        pos = C.STREAM_HEADER_SIZE_BYTES
        dc = None
        if header.preconditioned:
            ph = PreconditionHeader.unpack(blob[pos:])
            pos += C.PRECON_HEADER_SIZE_BYTES
            dc = DataConditionParams(
                precondition=True, swizzle=ph.swizzled,
                format=ph.data_format, num_mip_levels=ph.num_mips,
                pitch_d3d12_aligned=ph.pitch_d3d12_aligned)
            dc.width_in_blocks[0] = ph.width_in_blocks
            dc.height_in_blocks[0] = ph.height_in_blocks
            dc.pitch_in_bytes[0] = ph.pitch_in_bytes
        out_size = header.uncompressed_size
        outs.append(bytearray(out_size))
        if dc is not None:
            dc.initialize(out_size)
        metas.append((header, dc, set()))
        if header.num_pages == 0:
            continue
        offsets, sizes = unpack_page_table(blob[pos:], header.num_pages)
        payload_base = pos + header.num_pages * 4
        ps = header.page_size
        for i in range(header.num_pages):
            posz = (header.last_page_size
                    if (i == header.num_pages - 1 and header.last_page_size)
                    else ps)
            off = payload_base + int(offsets[i])
            sz = int(sizes[i])
            if sz == posz:  # raw page
                outs[ai][i * ps: i * ps + posz] = blob[off: off + posz]
            else:
                jobs_by_psize.setdefault(ps, []).append(
                    (ai, i, off, sz, posz))

    for ps, jobs in jobs_by_psize.items():
        W = ps // 4 + 8
        mc = max_cmds_for(ps)
        for c0 in range(0, len(jobs), batch_pages):
            group = jobs[c0: c0 + batch_pages]
            rows = group + [group[0]] * (batch_pages - len(group)) \
                if len(jobs) > batch_pages else group
            arr = np.zeros((len(rows), W * 4), dtype=np.uint8)
            in_sizes = np.zeros(len(rows), dtype=np.int32)
            for r, (ai, i, off, sz, posz) in enumerate(rows):
                arr[r, :sz] = np.frombuffer(blobs[ai], np.uint8, sz, off)
                in_sizes[r] = sz
            pages_out, isdelta = decode_pages(
                jnp.asarray(arr.view(np.uint32).reshape(len(rows), W)),
                jnp.asarray(in_sizes), ps, mc)
            pages_np = np.asarray(pages_out)
            isdelta_np = np.asarray(isdelta)
            for r, (ai, i, off, sz, posz) in enumerate(group):
                outs[ai][i * ps: i * ps + posz] = \
                    pages_np[r, :posz].tobytes()
                if isdelta_np[r]:
                    metas[ai][2].add(i)

    results = []
    for ai, (header, dc, delta_pages) in enumerate(metas):
        if dc is not None:
            results.append(postprocess_device(
                bytes(outs[ai]), dc, header.page_size, delta_pages))
        else:
            results.append(bytes(outs[ai]))
    return results


def encode_archives(datas: Sequence[bytes], page_size: int = 65536
                    ) -> dict[int, bytes]:
    """Encode this process's share of inputs (native CPU encoder)."""
    from .. import api
    out: dict[int, bytes] = {}
    for i in my_archive_indices(len(datas)):
        out[i] = api.encode(datas[i], page_size=page_size)
    return out
