"""Structured Streaming operators (brief: streams are first-class even though
the reference is batch-only — SURVEY.md §1.4 notes streaming is absent there)."""
