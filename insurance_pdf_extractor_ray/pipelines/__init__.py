"""End-to-end Ray Data pipelines composed from sources + stages + functions."""
