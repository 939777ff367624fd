"""End-to-end pipelines mirroring the reference DAG's tasks (SURVEY.md §3)."""
