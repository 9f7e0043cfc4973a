"""Query plans: the registered analytics surface + the whale pipeline."""
