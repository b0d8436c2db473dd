"""Host-side utilities: configs, datasets, trajectories, metrics."""
