"""Structured Streaming surface (SURVEY.md §2.9 — net-new capability)."""
