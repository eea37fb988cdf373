"""Placeholder — filled in by the build plan (SURVEY.md §7)."""
