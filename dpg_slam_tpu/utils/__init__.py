"""Utilities: trajectory metrics, profiling, checkpointing."""
