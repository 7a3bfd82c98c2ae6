"""Durable run state: partition manifests, lineage, resume."""
