"""Ray Data operator stages — the SURVEY.md §2 operator inventory."""
