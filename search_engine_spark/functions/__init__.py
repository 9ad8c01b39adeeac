"""Column-expression and UDF function library."""
