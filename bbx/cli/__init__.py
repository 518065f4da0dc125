"""Entry points (L5): train / evaluate / play / benchmark CLIs."""
