"""Command-line interface (reference src/bayesgm/cli/)."""
