"""Utility substrate (the analog of the reference's Switch/ layer, SURVEY §1 L0)."""
