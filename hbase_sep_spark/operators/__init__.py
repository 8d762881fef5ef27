"""Operators library."""
