"""Sources & sinks: readers, raw-text format parsers, partitioned writers."""
