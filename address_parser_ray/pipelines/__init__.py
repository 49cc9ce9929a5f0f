"""End-to-end pipelines + the query/oracle registry."""
