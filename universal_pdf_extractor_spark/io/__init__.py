"""Input fixtures, lineage manifests, and sinks."""
