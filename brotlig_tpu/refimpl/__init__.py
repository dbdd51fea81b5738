"""Scalar CPU reference implementation (oracle) of the Brotli-G codec."""
