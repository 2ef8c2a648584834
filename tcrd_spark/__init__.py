"""tcrd_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of unmtransinfo/TCRD, re-expressed Spark-first.

Layout:
  sources/    parquet lake registry + raw-format readers (OBO/GCT/matrix)
  operators/  relational operator inventory (SURVEY.md §2.2-2.6, §2.8)
  functions/  scalar/EAV helpers (SURVEY.md §2.7, §1.1)
  analytics/  derived-analytics jobs: TDL, tau, consensus, HGram, TIN-X, KEGG
  pipeline/   LLM-training-data operators: dedup, similarity, text, multimodal
  streaming/  Structured Streaming layer over the events table
  plans/      plan-inspection helpers (explain/shuffle audit)

Everything is declarative DataFrame/SQL; Catalyst picks the physical plan.
"""

__version__ = "0.1.0"
