"""Structured-Streaming ingestion of feature change streams."""
