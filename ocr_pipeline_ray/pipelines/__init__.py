"""End-to-end Ray Data pipelines (flagship extraction + the query suite)."""
