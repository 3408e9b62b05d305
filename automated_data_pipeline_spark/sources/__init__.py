"""Sources & sinks: file readers (CSV/JSON, case-insensitive header
resolution), synthetic generators, scrape-source stub, JDBC wrapper."""
