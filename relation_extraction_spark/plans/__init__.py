"""Stage DAG, pipeline config/resume, and the oracle-checked query registry."""
