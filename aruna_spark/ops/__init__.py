"""Operator library: catalog listings, pagination, LWW, usage, dedup, similarity."""
