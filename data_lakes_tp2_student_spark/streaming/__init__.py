"""Structured Streaming variants (SURVEY.md §2 i4/i5) of the batch
event-time operators."""
