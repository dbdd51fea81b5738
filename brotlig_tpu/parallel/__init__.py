"""Distributed runtime: page sharding over device meshes, ordered gather."""
