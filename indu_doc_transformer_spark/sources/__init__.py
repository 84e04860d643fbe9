"""Sources and sinks: synthetic web corpus, catalog read/write layer."""
