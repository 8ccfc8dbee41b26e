"""Structured Streaming surface (SURVEY.md §2.7 L1-L8)."""
