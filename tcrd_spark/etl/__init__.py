"""ETL layer: reusable entity-resolution joins + loader pipelines
(SURVEY.md §7 'etl/')."""
