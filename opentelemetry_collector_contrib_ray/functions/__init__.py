"""Vectorized kernel library (OTTL-function / stanza-helper equivalents)."""
