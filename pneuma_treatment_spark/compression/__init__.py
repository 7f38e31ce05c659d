"""Chunk compression codecs for rollup series storage."""
