"""Sources & sinks (SURVEY.md §2.1): OBIS REST, raw-zone files, JDBC."""
