"""Mesh / sharding utilities and distributed solvers."""
