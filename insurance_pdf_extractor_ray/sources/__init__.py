"""Sources & sinks: table readers/writers and the synthetic corpus generator."""
