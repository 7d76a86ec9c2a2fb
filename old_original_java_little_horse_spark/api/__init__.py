"""HTTP command/query API (SURVEY §2.1 S8)."""
