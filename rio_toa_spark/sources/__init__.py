"""Synthetic fixture generation and table loading."""
