"""Staged pipeline driver: checkpointed stages, resume manifest, lineage."""
