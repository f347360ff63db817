"""IO, config, checkpoint, plotting utilities."""
