"""Host-side utilities: dataset IO, trajectory, evaluation, oracle, timing."""
