"""Utilities: FLOPs counting, metrics, analysis."""
