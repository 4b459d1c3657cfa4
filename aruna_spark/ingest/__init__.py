"""Ingestion layer: projections from raw sources into the engine's tables."""
