"""Checkpoint/resume + lineage for partitioned pipeline runs."""
