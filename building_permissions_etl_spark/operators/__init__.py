"""Operator library (SURVEY.md §2) — composable DataFrame → DataFrame ops."""
