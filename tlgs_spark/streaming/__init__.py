"""Incremental / streaming-equivalent index maintenance.

The reference has no stream processor; its crawler IS an incremental,
restartable index maintainer (SURVEY §2.8). This package provides:

- incremental.py — change-detected partial re-index (the
  crawler.cpp:424-429 hash short-circuit, per shard)
- ingest.py — Structured Streaming ingestion of new transcript turns
  (windowed counts w/ watermark; availableNow micro-batch used for
  deterministic tests)
"""
