"""Synthetic data, IO, metrics, profiling."""
