"""Deterministic fixture generators (FIXTURES.md; seed=42 throughout)."""
