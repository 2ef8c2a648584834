"""Provenance + count-report layer (SURVEY.md §7 'quality/')."""
