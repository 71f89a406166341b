"""Relational + domain operators (SURVEY.md §2)."""
