"""Structured Streaming operators (incremental dedup).

The reference is strictly batch (SURVEY.md §2.10: no streaming of any
kind); this package extends the engine so a standing ingestion pipeline
can deduplicate new image+caption rows incrementally against the
accumulated corpus.
"""
