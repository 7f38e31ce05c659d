"""Structured Streaming tier: incremental rollups over a transcript stream."""
