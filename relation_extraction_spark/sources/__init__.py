"""Sources & sinks: synthetic corpus, lakehouse snapshot tables, dictionary."""
