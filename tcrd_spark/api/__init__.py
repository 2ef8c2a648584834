"""DataFrame-returning equivalents of the reference DBAdaptor read
surface (`loaders/TCRD.py` ~170 methods) — SURVEY.md §7 'api/'."""
