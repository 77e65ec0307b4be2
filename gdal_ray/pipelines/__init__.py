"""Composed Ray Data pipelines (SURVEY.md §7 milestones)."""
