"""Scalar function library (SURVEY.md §2.8) — all native Column expressions."""
