"""Logging, CLI, checkpointing utilities."""
