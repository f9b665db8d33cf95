"""Operational CLIs (SURVEY.md §2.11 X4)."""
