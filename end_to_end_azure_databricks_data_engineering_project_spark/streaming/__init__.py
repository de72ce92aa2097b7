"""Streaming flows: silver refinement (file stream → cleanse → managed
table) and the gold CDC flow registry + DAG runner (≙ DLT pipeline)."""
