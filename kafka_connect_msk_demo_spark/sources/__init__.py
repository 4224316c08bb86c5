"""Source adapters: file-backed topic envelopes, Kafka/JDBC config
builders, and CDC envelope fixtures (SURVEY.md §2.1)."""
