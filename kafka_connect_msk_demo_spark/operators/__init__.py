"""Batch relational operators (SURVEY.md §2.3-§2.8), Spark-first."""
