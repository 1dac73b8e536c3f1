"""Operator inventory of SURVEY.md §2, re-expressed as DataFrame plans."""
