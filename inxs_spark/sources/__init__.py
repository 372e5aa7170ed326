"""Sources/sinks: session builder, table I/O seam, transcript synthesis."""
