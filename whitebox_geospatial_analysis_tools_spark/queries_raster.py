"""Placeholder — filled in below."""
