"""Custom operators the reference implements as pipeline stages, re-expressed
as DataFrame->DataFrame functions (SURVEY.md §2)."""
