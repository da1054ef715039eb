"""Composed end-to-end pipelines."""
