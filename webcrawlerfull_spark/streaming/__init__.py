"""Micro-batch crawl loop (Structured-Streaming-style rounds)."""
