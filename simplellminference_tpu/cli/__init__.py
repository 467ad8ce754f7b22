"""Command-line entry points (successor of the reference's gitignored /demo)."""
