"""CLI entry points: train, translate, prepare_corpora."""
