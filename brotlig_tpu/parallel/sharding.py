"""Distributed decode runtime: pages sharded data-parallel over a device mesh.

The Brotli-G format guarantees zero cross-page dependence (SURVEY.md §2.12),
so the parallel decomposition is pure DP over a 'pages' mesh axis: inputs
(padded compressed pages + sizes) are sharded on their leading axis, the
whole decode pipeline partitions under SPMD with no collectives, and the
ordered gather of decompressed pages is the output sharding hand-off. This
replaces the reference's atomic work-queue scheduling
(BrotligEncoder.cpp:389, BrotliGCompute.hlsl:1810-1821) with a static
interleaved assignment — deterministic schedules beat work stealing under
SPMD because page cost variance is bounded by the 2x compressed-size bound.
"""
from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..format import constants as C
from ..ops.decode import _stage_lz, _stage_symbols, max_cmds_for


def make_mesh(devices=None, axis: str = "pages") -> Mesh:
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (axis,))


def pad_batch(n: int, n_devices: int) -> int:
    """Pages per shard x devices >= n."""
    return (n + n_devices - 1) // n_devices * n_devices


def decode_pages_sharded(words, in_sizes, page_size: int, mesh: Mesh):
    """Decode a batch of compressed pages sharded over mesh axis 'pages'.

    words: uint32 [P, W] with P divisible by mesh size.
    Returns (out [P, page_size] uint8, isdelta [P]) with the same sharding.
    """
    max_cmds = max_cmds_for(page_size)
    axis = mesh.axis_names[0]
    shard = NamedSharding(mesh, P(axis))

    words = jax.device_put(words, shard)
    in_sizes = jax.device_put(in_sizes, shard)
    sym = _stage_symbols(words, in_sizes, page_size, max_cmds)
    out = _stage_lz(*sym[:8], page_size, max_cmds)
    return out, sym[8]


def decode_pages_sharded_pallas(words, in_sizes, page_size: int,
                                mesh: Mesh, wl: int, sweep_cw: int = 1024,
                                interpret: bool | None = None):
    """The flagship Pallas route under shard_map: every mesh shard runs
    the fused single-dispatch decode kernel (phase A + B in one
    pallas_call) on its page subset — the whole-decoder-per-workgroup
    model of the reference (BrotliGCompute.hlsl:1755-1882) mapped onto
    SPMD shards. No collectives: pages are independent by format design.

    words/in_sizes: [P, W]/[P] with P divisible by the mesh size.
    wl: per-stream word capacity (pallas_decode.wl_bucket of the host
    hint). Returns (out [P, page_size] uint8, isdelta [P]), sharded."""
    from ..ops import pallas_decode as PD
    from ..ops.decode import _pallas_interpret

    if interpret is None:
        interpret = _pallas_interpret()
    max_cmds = max_cmds_for(page_size)
    axis = mesh.axis_names[0]
    spec = P(axis)
    shard = NamedSharding(mesh, spec)
    words = jax.device_put(words, shard)
    in_sizes = jax.device_put(in_sizes, shard)

    def step(w, s):
        out, isdelta, _ncmds, _stats = PD.decode_fused_pallas.__wrapped__(
            w, s, page_size, max_cmds, wl, interpret, sweep_cw)
        return out, isdelta

    # check_vma off: pallas_call outputs carry no varying-mesh-axes
    # annotation for the checker to verify (each shard's kernel touches
    # only its own pages — no cross-shard aliasing to detect)
    fn = jax.shard_map(step, mesh=mesh, in_specs=(spec, spec),
                       out_specs=(spec, spec), check_vma=False)
    return jax.jit(fn)(words, in_sizes)


def decode_stream_sharded(data: bytes, mesh: Mesh | None = None) -> bytes:
    """Stream-level decode with pages sharded across the mesh.

    Single-host orchestration: the container is parsed on host, compressed
    pages are padded into a [P, W] batch (P padded to a mesh multiple with
    empty dummy pages), decoded SPMD, and gathered in stream order.
    """
    from ..format.headers import parse_container
    from ..format.precondition import delta_decode_page, decondition

    if mesh is None:
        mesh = make_mesh()
    info = parse_container(data)
    header, dc_params = info.header, info.dc_params
    if header.num_pages == 0:
        return b""
    page_size = header.page_size
    out_size = info.out_size
    offsets, sizes = info.offsets, info.sizes
    payload = data  # offsets are absolute
    page_out_sizes = info.page_out_sizes
    comp_idx = info.compressed_page_indices()

    out = bytearray(out_size)
    for i in info.raw_page_indices():
        off = int(offsets[i])
        out[i * page_size: i * page_size + page_out_sizes[i]] = \
            payload[off: off + page_out_sizes[i]]

    if comp_idx:
        n_dev = len(mesh.devices.flat)
        P_pad = pad_batch(len(comp_idx), n_dev)
        W = page_size // 4 + 8
        arr = np.zeros((P_pad, W * 4), dtype=np.uint8)
        in_sizes = np.zeros(P_pad, dtype=np.int32)
        # dummy rows: a minimal valid page (decodes fast, result dropped)
        dummy = _dummy_page(page_size)
        for row in range(P_pad):
            if row < len(comp_idx):
                i = comp_idx[row]
                off, sz = int(offsets[i]), int(sizes[i])
                arr[row, :sz] = np.frombuffer(payload, np.uint8, sz, off)
                in_sizes[row] = sz
            else:
                arr[row, : len(dummy)] = np.frombuffer(dummy, np.uint8)
                in_sizes[row] = len(dummy)
        pages_out, isdelta = decode_pages_sharded(
            jnp.asarray(arr.view(np.uint32).reshape(P_pad, W)),
            jnp.asarray(in_sizes), page_size, mesh)
        pages_np = np.asarray(pages_out)
        isdelta_np = np.asarray(isdelta)
        for row, i in enumerate(comp_idx):
            chunk = pages_np[row, : page_out_sizes[i]].tobytes()
            if isdelta_np[row] and dc_params is not None:
                chunk = delta_decode_page(chunk, i * page_size, dc_params)
            out[i * page_size: i * page_size + page_out_sizes[i]] = chunk

    if dc_params is not None:
        return decondition(bytes(out), dc_params)
    return bytes(out[:out_size])


_dummy_cache: dict[int, bytes] = {}


def _dummy_page(page_size: int) -> bytes:
    """A tiny valid compressed page used to pad batches to mesh multiples."""
    from ..refimpl.page_encoder import encode_page
    if page_size not in _dummy_cache:
        blob = encode_page(bytes(page_size), is_last=True)
        assert blob is not None and len(blob) != page_size
        _dummy_cache[page_size] = blob
    return _dummy_cache[page_size]
