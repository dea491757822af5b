"""Command-line trainer entry points mirroring the reference drivers."""
