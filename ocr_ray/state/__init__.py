"""Checkpoint manifest + resumable partitioned output."""
