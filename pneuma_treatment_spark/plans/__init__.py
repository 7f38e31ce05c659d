"""Pipeline planning: stage lineage manifests + resumable execution."""
