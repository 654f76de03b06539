"""End-to-end pipelines built on the operator library."""
