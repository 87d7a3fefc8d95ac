"""Relational / window / time-series operator implementations (SURVEY §2)."""
