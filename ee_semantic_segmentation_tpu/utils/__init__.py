"""Shared utilities: logging, profiling, registries support."""
