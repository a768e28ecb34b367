"""Dedup dataflow operators (north-rule pipeline P2-P14, SURVEY.md §2.11)."""
