"""Structured Streaming plane (SURVEY.md §2.9): file/Kafka stream
sources, complete/update/append sinks, watermarked event-time windows,
checkpointed lifecycle, and the foreachBatch upsert writer."""
