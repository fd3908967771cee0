"""Structured Streaming variants of the batch operators (SURVEY.md §3.4)."""
