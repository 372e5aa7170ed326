"""Structured Streaming ingest (SURVEY.md §3.C streaming row — v2
surface): the same kernel and pipeline reused per microbatch."""
