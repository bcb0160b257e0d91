"""Placeholder — streaming queries land in phase 3."""
