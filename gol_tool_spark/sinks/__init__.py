"""Query result sinks — the reference's 12 output formats (A9)."""
