"""Structured Streaming layer (extension; SURVEY.md §2.11).

The reference is pure batch — its closest analogues are keyset-resume
(`loaders/TCRD.py:2152`) and shelve checkpoints (`loaders/load-PubMed.
py:83`). This package adds the streaming surface a training-data
pipeline needs: tumbling/sliding/session windows with watermark
late-data handling, plus a custom stateful operator
(applyInPandasWithState)."""
