"""Command-line interfaces: train, evaluate, separate, benchmark."""
