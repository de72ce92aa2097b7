"""Sources & sinks: readers, watermark state, incremental ingestion,
autoloader-style file streaming, and versioned managed tables."""
