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

from ..ops.decode import decode_stream_jax


def process_info():
    try:
        return jax.process_index(), jax.process_count()
    except Exception:
        return 0, 1


def my_archive_indices(n_archives: int) -> list[int]:
    """Static interleaved assignment of archives to this process."""
    pid, nproc = process_info()
    return list(range(pid, n_archives, nproc))


def decode_archives(blobs: Sequence[bytes],
                    batch_pages: int = 256) -> dict[int, bytes]:
    """Decode this process's share of `blobs`.

    Returns {archive_index: decompressed bytes} for locally-owned archives;
    with one process this is every archive, in order. For the full
    multi-host gather, callers either write per-archive outputs to shared
    storage keyed by index (the intended 100 GB flow — no inter-host
    traffic) or all-gather small results.
    """
    out: dict[int, bytes] = {}
    for i in my_archive_indices(len(blobs)):
        out[i] = decode_stream_jax(blobs[i], batch_pages=batch_pages)
    return out


def encode_archives(datas: Sequence[bytes], page_size: int = 65536
                    ) -> dict[int, bytes]:
    """Encode this process's share of inputs (native CPU encoder)."""
    from .. import api
    out: dict[int, bytes] = {}
    for i in my_archive_indices(len(datas)):
        out[i] = api.encode(datas[i], page_size=page_size)
    return out
