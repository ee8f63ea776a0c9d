"""Relational + algorithmic operators of the engine."""
