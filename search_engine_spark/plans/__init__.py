"""Higher-level query plans: statistics, admin surfaces."""
