"""Operators: relational core + domain pipelines (SURVEY.md §2)."""
