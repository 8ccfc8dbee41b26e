"""Scalar/column function layer (SURVEY.md §2.2, §2.8)."""
