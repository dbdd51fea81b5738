"""Stream-level Brotli-G codec (container assembly / parse) — CPU oracle.

Mirrors the reference orchestration (src/BrotligEncoder.cpp:415-516,
src/BrotligDecoder.cpp:426-518): page split, optional preconditioning,
per-page encode with raw fallback, stream header + page table assembly.
"""
from __future__ import annotations

from ..format import constants as C
from ..format.errors import Aborted, MessageType, PageSizeError
from ..format.headers import (PreconditionHeader, StreamHeader,
                              pack_page_table, unpack_page_table)
from ..format.precondition import (DataConditionParams, condition,
                                   decondition, delta_decode_page,
                                   delta_encode_page)
from .page_decoder import decode_page
from .page_encoder import encode_page


def encode(data: bytes, page_size: int = C.DEFAULT_PAGE_SIZE,
           dc_params: DataConditionParams | None = None,
           max_chain: int = 64, feedback=None) -> bytes:
    """Compress `data` into a Brotli-G container.

    `feedback(message_type, text) -> bool` mirrors BROTLIG_Feedback_Proc
    (BrotligCommon.h:92): called with per-page progress; returning True
    aborts (raises Aborted).
    """
    if not (C.MIN_PAGE_SIZE <= page_size <= C.MAX_PAGE_SIZE):
        raise PageSizeError("page size out of range")
    input_size = len(data)

    precondition = dc_params is not None and dc_params.precondition
    if precondition and not dc_params.initialize(input_size):
        # geometry does not describe this input: downgrade to plain encode
        # (ref: BrotligEncoder.cpp conditioning failure path)
        precondition = False
    if precondition:
        work = condition(data, dc_params)
    else:
        work = bytes(data)

    header = StreamHeader.for_input(input_size, page_size, precondition)
    if input_size == 0:
        return header.pack()
    num_pages = header.num_pages

    pages = []
    for i in range(num_pages):
        start = i * page_size
        chunk = work[start: start + page_size]
        is_last = i == num_pages - 1
        delta_encoded = False
        if precondition and dc_params.delta_encode:
            chunk2, delta_encoded = delta_encode_page(
                chunk, start, dc_params)
            if delta_encoded:
                chunk = chunk2
        compressed = encode_page(chunk, is_last,
                                 delta_encoded=delta_encoded,
                                 max_chain=max_chain)
        if compressed is None:
            # raw page: signalled by size == uncompressed size
            start = i * page_size
            pages.append(work[start: start + page_size])
        else:
            pages.append(compressed)
        if feedback is not None:
            progress = 100.0 * (i + 1) / num_pages
            if feedback(MessageType.PROGRESS, f"{progress}"):
                raise Aborted("encode aborted by feedback callback")

    out = bytearray()
    out += header.pack()
    if precondition:
        out += PreconditionHeader(
            swizzled=dc_params.swizzle,
            pitch_d3d12_aligned=dc_params.pitch_d3d12_aligned,
            width_in_blocks=dc_params.width_in_blocks[0],
            height_in_blocks=dc_params.height_in_blocks[0],
            data_format=dc_params.format,
            num_mips=dc_params.num_mip_levels,
            pitch_in_bytes=dc_params.pitch_in_bytes[0],
        ).pack()
    out += pack_page_table([len(p) for p in pages])
    for p in pages:
        out += p
    return bytes(out)


def decompressed_size(data: bytes) -> int:
    return StreamHeader.unpack(data).uncompressed_size


def decode(data: bytes) -> bytes:
    """Decompress a Brotli-G container."""
    header = StreamHeader.unpack(data)
    pos = C.STREAM_HEADER_SIZE_BYTES

    dc_params = None
    if header.preconditioned:
        ph = PreconditionHeader.unpack(data[pos:])
        pos += C.PRECON_HEADER_SIZE_BYTES
        dc_params = DataConditionParams(
            precondition=True,
            swizzle=ph.swizzled,
            format=ph.data_format,
            num_mip_levels=ph.num_mips,
            pitch_d3d12_aligned=ph.pitch_d3d12_aligned,
        )
        dc_params.width_in_blocks[0] = ph.width_in_blocks
        dc_params.height_in_blocks[0] = ph.height_in_blocks
        dc_params.pitch_in_bytes[0] = ph.pitch_in_bytes

    num_pages = header.num_pages
    if num_pages == 0:
        return b""
    page_size = header.page_size
    out_size = header.uncompressed_size
    if header.preconditioned:
        dc_params.initialize(out_size)

    offsets, sizes = unpack_page_table(data[pos:], num_pages)
    pos += num_pages * 4
    payload = data[pos:]

    out = bytearray()
    for i in range(num_pages):
        page_out_size = (header.last_page_size
                         if (i == num_pages - 1 and header.last_page_size)
                         else page_size)
        page_data = payload[int(offsets[i]): int(offsets[i]) + int(sizes[i])]
        page, isdelta = decode_page(page_data, page_out_size)
        if isdelta and dc_params is not None:
            page = delta_decode_page(page, i * page_size, dc_params)
        out += page

    if header.preconditioned:
        return decondition(bytes(out), dc_params)
    return bytes(out[:out_size])
