"""Host utilities: checkpoints, logging, progress."""
