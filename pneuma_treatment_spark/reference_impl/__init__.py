"""Single-process pandas oracle mirroring the reference's semantics
(SURVEY.md §5): the Spark engine must match these outputs exactly."""
