"""Operator library (SURVEY §2) + LLM-data-pipeline extensions."""
