"""Physical-plan inspection helpers."""
