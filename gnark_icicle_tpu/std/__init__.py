"""Gadget standard library (≙ reference std/ — SURVEY.md §2.5)."""
