"""TCRD relational schema as a Spark lake (SURVEY.md §1)."""
