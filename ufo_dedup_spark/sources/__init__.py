"""Source scans and sinks (S1-S7)."""
