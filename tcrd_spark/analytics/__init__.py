"""Derived analytics (SURVEY.md §2.10): the reference's business-logic
functions re-expressed as pure DataFrame transformations — TDL
classification, tau tissue specificity, consensus expression,
Harmonogram CDFs, TIN-X novelty/importance/ranking."""
