"""Reusable operator implementations (SURVEY.md §2)."""
