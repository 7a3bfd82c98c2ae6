"""Batch-level pipeline stages (map_batches / map_groups callables)."""
