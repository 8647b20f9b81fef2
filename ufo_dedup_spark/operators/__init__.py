"""Composable DataFrame operators: blocking, pair management, dedup tiers,
MinHash/SimHash/LSH, suffix-array substring dedup, connected components."""
