"""End-to-end jobs: pipeline DAG, lineage, resume."""
