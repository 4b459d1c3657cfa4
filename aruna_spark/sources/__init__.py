"""Catalog sources: deterministic object-store tables over the testdata."""
