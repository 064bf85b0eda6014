"""End-to-end pipelines composed from the operator stages."""
