"""Logging, profiling, checkpointing."""
