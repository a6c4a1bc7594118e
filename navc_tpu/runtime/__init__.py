"""Training/eval runtime: losses, optimizer, train step, checkpointing, logging."""
