"""Minimal stand-in for the ``progress`` package (not installed)."""
