"""Executable format truth for Brotli-G (constants, LUTs, bit I/O, Huffman,
RLE, swizzled serialization, headers, preconditioning)."""
