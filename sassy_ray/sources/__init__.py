"""Sources: corpus synthesis + documents-table readers/utilities."""
