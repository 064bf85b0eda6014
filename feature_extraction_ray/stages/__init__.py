"""Dataset-level operator stages (each takes and returns ``ray.data.Dataset``)."""
