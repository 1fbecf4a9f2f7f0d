"""MLlib pipelines (SURVEY.md §2.9 M8–M12)."""
