"""Sources & sinks: Lance-like fragment+manifest tables, OSM XML reader."""
