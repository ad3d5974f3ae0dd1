"""Job-level planning: bucketed lineage, idempotent resume, metrics."""
