"""Structured Streaming surface: incremental edge ingest + windowed event stats."""
